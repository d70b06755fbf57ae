from . import response
from .pihna import pihna_physics, PIHNA_VARS

__all__ = ["response", "pihna_physics", "PIHNA_VARS"]
