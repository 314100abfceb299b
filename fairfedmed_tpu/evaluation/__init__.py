from . import metrics
from .evaluator import Classification, Classification_oph, build_evaluator

__all__ = ["metrics", "Classification", "Classification_oph", "build_evaluator"]
