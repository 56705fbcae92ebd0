from .mlp import init_mlp, apply_mlp
from .dlrm import DLRM
from .wdl import WDL
from .dcn import DCN

MODELS = {"dlrm": DLRM, "wdl": WDL, "dcn": DCN}

__all__ = ["init_mlp", "apply_mlp", "DLRM", "WDL", "DCN", "MODELS"]
