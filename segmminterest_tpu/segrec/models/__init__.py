"""SegRec model zoo: flax modules producing (B, I) candidate scores.

Each model is one module; the reference's *CTR / *Ranking class pairs map to
the same module run under different runners (CTR applies sigmoid + BCE,
Ranking applies softmax-weighted BPR).
"""

from .fm import FMModel
from .widedeep import WideDeepModel
from .cliprec import ClipWDModel
from .din import DINModel, ClipDINModel
from .dcn import DCNModel, DCNv2Model
from .autoint import AutoIntModel
from .finalmlp import FinalMLPModel
from .adagin import AdaGINModel
from .dien import DIENModel
from .can import CANModel
from .sdim import ETAModel, SDIMModel
from .clip_variants import (ClipAdaGINModel, ClipAutoIntModel, ClipCANModel,
                            ClipDCNv2Model, ClipDIENModel, ClipFinalMLPModel)
from .general import (BPRMFModel, BUIRModel, DirectAUModel, LightGCNModel,
                      NeuMFModel, POPModel)
from .sequential import (CaserModel, CLRecModel, ComiRecModel,
                         ContraRecModel, FourierTAModel, FPMCModel,
                         GRU4RecModel, NARMModel, S3RecModel, SASRecModel,
                         SRGNNModel, TiMiRecModel, TiSASRecModel)
from .deepfm import AFMModel, DeepFMModel, XDeepFMModel
from .sam import SAMModel

MODEL_REGISTRY = {
    "BPRMF": BPRMFModel,
    "BUIR": BUIRModel,
    "NeuMF": NeuMFModel,
    "LightGCN": LightGCNModel,
    "DirectAU": DirectAUModel,
    "POP": POPModel,
    "SASRec": SASRecModel,
    "GRU4Rec": GRU4RecModel,
    "Caser": CaserModel,
    "NARM": NARMModel,
    "FPMC": FPMCModel,
    "TiSASRec": TiSASRecModel,
    "ComiRec": ComiRecModel,
    "ContraRec": ContraRecModel,
    "TiMiRec": TiMiRecModel,
    "SRGNN": SRGNNModel,
    "CLRec": CLRecModel,
    "FourierTA": FourierTAModel,
    "S3Rec": S3RecModel,
    "FM": FMModel,
    "WideDeep": WideDeepModel,
    "DeepFM": DeepFMModel,
    "AFM": AFMModel,
    "xDeepFM": XDeepFMModel,
    "SAM": SAMModel,
    "DCN": DCNModel,
    "DCNv2": DCNv2Model,
    "AutoInt": AutoIntModel,
    "FinalMLP": FinalMLPModel,
    "AdaGIN": AdaGINModel,
    "DIN": DINModel,
    "DIEN": DIENModel,
    "CAN": CANModel,
    "SDIM": SDIMModel,
    "ETA": ETAModel,
    "ClipRec": ClipWDModel,     # reference ClipRec.py is the WideDeep variant
    "ClipWDRec": ClipWDModel,
    "ClipDCNv2Rec": ClipDCNv2Model,
    "ClipAutoIntRec": ClipAutoIntModel,
    "ClipFinalMLPRec": ClipFinalMLPModel,
    "ClipAdaGINRec": ClipAdaGINModel,
    "ClipDINRec": ClipDINModel,
    "ClipDIENRec": ClipDIENModel,
    "ClipCANRec": ClipCANModel,
}

__all__ = ["MODEL_REGISTRY"] + sorted(
    {cls.__name__ for cls in MODEL_REGISTRY.values()})
