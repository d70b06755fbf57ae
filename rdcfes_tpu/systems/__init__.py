from .transient import TransientRDCSystem, clamp_nonnegative
from .solid import SolidSystem, SolidBC

__all__ = ["TransientRDCSystem", "clamp_nonnegative", "SolidSystem", "SolidBC"]
