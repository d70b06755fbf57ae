from .core import (Mesh, MixedMesh, MeshBlock, ELEMENT_FACES,
                   extract_boundary_faces)
from .generators import (box_hex_mesh, box_mixed_mesh, box_quad_mesh,
                         box_tet_mesh, box_tri_mesh, tet4_to_tet10)
from .refine import refine_uniform, refine_flagged, Refinement
from .adapt import AdaptiveMesh, AdaptOutcome, adapt_flagged
from .constrain import ConstrainedAdaptResult, ConstrainedMesh
from . import gmsh
from . import transform

__all__ = [
    "Mesh",
    "MixedMesh",
    "MeshBlock",
    "ELEMENT_FACES",
    "extract_boundary_faces",
    "box_hex_mesh",
    "box_mixed_mesh",
    "box_quad_mesh",
    "box_tet_mesh",
    "box_tri_mesh",
    "tet4_to_tet10",
    "refine_uniform",
    "refine_flagged",
    "AdaptiveMesh",
    "AdaptOutcome",
    "adapt_flagged",
    "ConstrainedAdaptResult",
    "ConstrainedMesh",
    "Refinement",
    "gmsh",
    "transform",
]
