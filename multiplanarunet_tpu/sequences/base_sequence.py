"""Base batch-sampler API.

The reference builds on keras.utils.Sequence (`mpunet/sequences/
base_sequence.py`); here a sequence is a plain iterable of (X, y, w) batches
with an effectively infinite __len__ (epoch length is imposed by the
Trainer, as in the reference where __len__ returns a sentinel,
`isotrophic_live_view_sequence.py:49-51`)."""

from __future__ import annotations

import os

import numpy as np


class BaseSequence:
    def __init__(self):
        self._batch_size = None

    def __len__(self):
        return int(1e12)

    def __getitem__(self, idx):
        raise NotImplementedError

    def __iter__(self):
        i = 0
        while True:
            yield self[i]
            i += 1

    def __call__(self):
        """Generator of batches (keras-free replacement for the reference's
        tf.data.Dataset.from_generator adapter)."""
        return iter(self)

    def seed(self):
        """Re-seed numpy in worker processes so parallel samplers differ."""
        pid = os.getpid()
        if getattr(self, "_seeded_pid", None) != pid:
            np.random.seed((np.random.SeedSequence().entropy + pid) % (2**31))
            self._seeded_pid = pid

    @property
    def batch_size(self):
        return self._batch_size

    @batch_size.setter
    def batch_size(self, value):
        if value is None or value < 0:
            raise ValueError(f"Invalid batch size {value}")
        self._batch_size = int(value)

    @property
    def n_samples(self):
        return len(self)
