from pixie_tpu.models.unet3d import (
    FeatureProjector,
    MyUNetModel,
    RegressionUNet,
    SegmentationUNet,
)
