from .sinkhorn import entropic_cot, sinkhorn

__all__ = ["sinkhorn", "entropic_cot"]
