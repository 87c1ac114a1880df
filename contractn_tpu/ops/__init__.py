from .stabilize import MIN_NORM, stabilize, destabilize
from .chain import stabilized_chain_product

__all__ = ["MIN_NORM", "stabilize", "destabilize", "stabilized_chain_product"]
