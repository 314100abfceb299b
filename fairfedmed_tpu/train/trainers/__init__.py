from .glp_ot import GLP_OT, GLP_OT_SVLoRA
from .promptfl import CLIP, Baseline, PromptFL

__all__ = ["GLP_OT", "GLP_OT_SVLoRA", "PromptFL", "CLIP", "Baseline"]
