from stylex_tpu.models.mapping import StyleVectorizer
from stylex_tpu.models.generator import (
    Generator,
    GeneratorBlock,
    RGBBlock,
    generator_filters,
    style_coord_dims,
    num_style_coords,
    sindex_to_block_and_offset,
)
from stylex_tpu.models.discriminator import (
    DiscriminatorE,
    DiscriminatorBlock,
    discriminator_filters,
)
from stylex_tpu.models.stylex import (
    StylExModules,
    build_stylex,
    init_stylex_params,
    make_w,
    prior_w,
    ema_update,
)
from stylex_tpu.models.debug_encoders import encoder_registry

__all__ = [
    "StyleVectorizer",
    "Generator",
    "GeneratorBlock",
    "RGBBlock",
    "generator_filters",
    "style_coord_dims",
    "num_style_coords",
    "sindex_to_block_and_offset",
    "DiscriminatorE",
    "DiscriminatorBlock",
    "discriminator_filters",
    "StylExModules",
    "build_stylex",
    "init_stylex_params",
    "make_w",
    "prior_w",
    "ema_update",
    "encoder_registry",
]
