from pixie_tpu.utils.norm import (
    NormalizationRanges,
    load_normalization_ranges,
    normalize_material_grid,
    scale_to_unit,
    unscale_prediction,
)
from pixie_tpu.utils.metrics import masked_mean, compute_accuracy
