from .checkpoint import save_checkpoint, load_checkpoint
from .ida import inverse_distance_interpolate
from . import scalars

__all__ = ["save_checkpoint", "load_checkpoint", "inverse_distance_interpolate",
           "scalars"]
