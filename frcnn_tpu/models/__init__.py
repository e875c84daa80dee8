from frcnn_tpu.models.pnet import ProposalNet
from frcnn_tpu.models.cnet import ClassificationNet
from frcnn_tpu.models.factory import create_models, init_params

__all__ = ["ProposalNet", "ClassificationNet", "create_models", "init_params"]
