"""Neural-network building blocks (flax) and the backbone zoo."""
from .layers import (AtrousSeparableConv, GroupNorm, HeadBlock,
                     MobileSeparableConv, SqueezeExcite)

__all__ = ['GroupNorm', 'SqueezeExcite', 'MobileSeparableConv',
           'AtrousSeparableConv', 'HeadBlock']
