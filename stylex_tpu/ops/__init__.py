from stylex_tpu.ops.modconv import modulated_conv2d, modulated_upsample_conv2d, demod_scale
from stylex_tpu.ops.blur import blur3, upsample2x_bilinear, upsample2x_blur, downsample_blur
from stylex_tpu.ops.latents import (
    latent_noise,
    image_noise,
    mixing_cutoff,
    expand_styles,
    mixed_w_styles,
    truncate_w,
    slerp,
    lpips_normalize,
    evaluate_in_chunks,
)
from stylex_tpu.ops.diffaug import (
    diff_augment,
    random_hflip,
    augment_for_discriminator,
    AUGMENT_TYPES,
)

__all__ = [
    "modulated_conv2d",
    "modulated_upsample_conv2d",
    "demod_scale",
    "blur3",
    "upsample2x_bilinear",
    "upsample2x_blur",
    "downsample_blur",
    "latent_noise",
    "image_noise",
    "mixing_cutoff",
    "expand_styles",
    "mixed_w_styles",
    "truncate_w",
    "slerp",
    "lpips_normalize",
    "evaluate_in_chunks",
    "diff_augment",
    "random_hflip",
    "augment_for_discriminator",
    "AUGMENT_TYPES",
]
