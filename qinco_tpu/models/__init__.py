from .spec import QincoSpec, spec_from_cfg
from .params import QincoParams, StepParams, ModelState, init_params, init_model_state
from .qinco import decode, encode, encode_chunked, train_forward

__all__ = [
    "QincoSpec",
    "spec_from_cfg",
    "QincoParams",
    "StepParams",
    "ModelState",
    "init_params",
    "init_model_state",
    "decode",
    "encode",
    "encode_chunked",
    "train_forward",
]
