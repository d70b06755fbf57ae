from .transient import TransientRDCSystem, clamp_nonnegative

__all__ = ["TransientRDCSystem", "clamp_nonnegative"]
