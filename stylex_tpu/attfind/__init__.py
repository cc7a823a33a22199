from stylex_tpu.attfind.extraction import (
    AttFindRecords,
    attfind_extraction,
    find_discriminator_threshold,
    save_records_hdf5,
    load_records_hdf5,
)
from stylex_tpu.attfind.analysis import (
    filter_unstable_images,
    split_by_class,
    find_significant_styles,
    merge_and_score,
    style_vector_distances,
    rank_styles,
    warn_visualize_top,
)
from stylex_tpu.attfind.visualize import (
    generate_change_image_given_dlatent,
    generate_images_given_dlatent,
    visualize_style,
    visualize_style_by_distance_in_s,
)

__all__ = [
    "AttFindRecords",
    "attfind_extraction",
    "find_discriminator_threshold",
    "save_records_hdf5",
    "load_records_hdf5",
    "filter_unstable_images",
    "split_by_class",
    "find_significant_styles",
    "merge_and_score",
    "style_vector_distances",
    "rank_styles",
    "warn_visualize_top",
    "generate_change_image_given_dlatent",
    "generate_images_given_dlatent",
    "visualize_style",
    "visualize_style_by_distance_in_s",
]
