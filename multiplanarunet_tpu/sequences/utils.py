"""Sequence factory: intrp_style name -> sampler (parity:
`mpunet/sequences/utils.py`). Bare ImagePairLoaders are wrapped in a
LazyQueue; augmenter config dicts are instantiated here."""

from __future__ import annotations

from multiplanarunet_tpu.augmentation.augmenters import build_augmenters
from multiplanarunet_tpu.image.image_pair_loader import ImagePairLoader
from multiplanarunet_tpu.image.queue import LazyQueue
from multiplanarunet_tpu.sequences.iso_3d import IsotrophicLiveViewSequence3D
from multiplanarunet_tpu.sequences.multi_planar import (
    IsotrophicLiveViewSequence2D,
)
from multiplanarunet_tpu.sequences.multi_task import MultiTaskSequence
from multiplanarunet_tpu.sequences.patches_3d import (
    PatchSequence3D,
    SlidingPatchSequence3D,
)

_STYLES = {
    "iso_live": "2d",
    "iso_live_3d": "3d",
    "patches_3d": "patch",
    "sliding_patches_3d": "sliding",
}


def get_sequence(data_queue, intrp_style, augmenters=None, logger=None,
                 **kwargs):
    """Build the sampler matching `intrp_style` over a data queue/loader."""
    style = intrp_style.lower()
    if style not in _STYLES:
        raise ValueError(
            f"Unknown intrp_style '{intrp_style}'; valid: {sorted(_STYLES)}"
        )
    if isinstance(data_queue, ImagePairLoader):
        data_queue = LazyQueue(data_queue, logger=logger)

    aug_list = build_augmenters(augmenters) if augmenters else None
    kwargs.pop("list_of_augmenters", None)

    common = dict(logger=logger, list_of_augmenters=aug_list, **kwargs)
    if style == "iso_live":
        return IsotrophicLiveViewSequence2D(data_queue, **common)
    if style == "iso_live_3d":
        return IsotrophicLiveViewSequence3D(data_queue, **common)
    common.pop("list_of_augmenters")
    if style == "patches_3d":
        return PatchSequence3D(data_queue, **common)
    return SlidingPatchSequence3D(data_queue, **common)
