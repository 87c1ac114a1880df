from .fit import fit_tn, make_tn_train_step
from .mesh import make_mesh
from .pipeline import make_pipeline_train_step, pipeline_mps_forward
from .sharded import sharded_mps_forward, segment_mps_forward
from .tp import make_tp_train_step, segment_mps_forward_3d
from .training import (
    make_optax_train_step,
    make_sharded_train_step,
    make_train_step,
    sgd_init,
)

__all__ = [
    "make_mesh",
    "fit_tn",
    "make_tn_train_step",
    "make_pipeline_train_step",
    "pipeline_mps_forward",
    "sharded_mps_forward",
    "segment_mps_forward",
    "segment_mps_forward_3d",
    "make_train_step",
    "make_optax_train_step",
    "make_sharded_train_step",
    "make_tp_train_step",
    "sgd_init",
]
