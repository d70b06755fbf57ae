from . import elements
from .geometry import geometry_factors, face_geometry_factors
from .weakform import WeakForm, element_vectors, element_matrices
from .assembly import (
    NodePairSparsity,
    build_sparsity,
    assemble_matrix,
    assemble_vector,
    interpolate_at_qp,
)
from .bcsr import bcsr_matvec, extract_diagonal_blocks

__all__ = [
    "elements",
    "geometry_factors",
    "face_geometry_factors",
    "WeakForm",
    "element_vectors",
    "element_matrices",
    "NodePairSparsity",
    "build_sparsity",
    "assemble_matrix",
    "assemble_vector",
    "interpolate_at_qp",
    "bcsr_matvec",
    "extract_diagonal_blocks",
]
