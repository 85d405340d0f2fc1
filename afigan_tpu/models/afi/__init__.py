from .generator import AFIGenerator, ResidualDenseBlock, ResidualInResidual
from .discriminator import PatchDiscriminator

__all__ = [
    "AFIGenerator",
    "ResidualDenseBlock",
    "ResidualInResidual",
    "PatchDiscriminator",
]
