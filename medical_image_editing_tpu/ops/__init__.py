"""Pure functional numerics. Every op here is jit-safe, shape-static and
layout-NHWC; collective-aware ops take an optional `axis_name`."""

from .windowing import (
    normalize,
    t_normalize,
    denormalize,
    norm,
    denorm,
    normalize_intensity,
    LUNG_WINDOW,
    MEDIASTINAL_WINDOW,
)
from .onehot import one_hot
from .vq import (
    VQState,
    vq_init,
    vq_assign,
    vq_lookup,
    vq_apply,
    straight_through,
)
from .kmeans import kmeans
from .losses import (
    embedding_loss,
    hinge_d_loss,
    vanilla_d_loss,
    focal_frequency_loss,
    soft_dice_loss,
    focal_loss,
)
from .cutmix import cutmix_coordinates, cutmix, mask_src_tgt, cutmix_mask
from .dropblock import dropblock_2d, dropblock_schedule
from .metrics import nmse, psnr, ssim, label_entropy
