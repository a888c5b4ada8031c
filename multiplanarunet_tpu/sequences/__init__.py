from multiplanarunet_tpu.sequences.base_sequence import BaseSequence
from multiplanarunet_tpu.sequences.multi_planar import (
    IsotrophicLiveViewSequence,
    IsotrophicLiveViewSequence2D,
)
from multiplanarunet_tpu.sequences.iso_3d import IsotrophicLiveViewSequence3D
from multiplanarunet_tpu.sequences.patches_3d import (
    PatchSequence3D,
    SlidingPatchSequence3D,
    center_expand,
)
from multiplanarunet_tpu.sequences.multi_task import MultiTaskSequence
from multiplanarunet_tpu.sequences.utils import get_sequence
from multiplanarunet_tpu.sequences.simple_sequences import RandomDataFeeder
