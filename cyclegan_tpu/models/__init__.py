"""Model zoo (reference layer L2 — SURVEY.md §1/§2).

Pure module factories — no device placement; sharding is external
(``cyclegan_tpu.parallel``).
"""

from cyclegan_tpu.models.generators import ResnetGenerator, UnetGenerator, define_Gen
from cyclegan_tpu.models.discriminators import (
    NLayerDiscriminator,
    PixelDiscriminator,
    define_Dis,
)

__all__ = [
    "ResnetGenerator",
    "UnetGenerator",
    "define_Gen",
    "NLayerDiscriminator",
    "PixelDiscriminator",
    "define_Dis",
]
