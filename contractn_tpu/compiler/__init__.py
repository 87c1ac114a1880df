from .einstring import make_einstring, make_arg_packer
from .engine import contract

__all__ = ["make_einstring", "make_arg_packer", "contract"]
