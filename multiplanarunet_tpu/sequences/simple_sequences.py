"""Array-backed feeder sequences (parity: `mpunet/sequences/simple_sequences.py`)."""

from __future__ import annotations

import numpy as np

from multiplanarunet_tpu.sequences.base_sequence import BaseSequence


class RandomDataFeeder(BaseSequence):
    """Feeds random subsets of fixed (X, y) arrays as batches."""

    def __init__(self, X, y, batch_size, sample_weights=None, **kwargs):
        super().__init__()
        self.X = np.asarray(X)
        self.y = np.asarray(y)
        self.sample_weights = (np.ones(len(self.X), np.float32)
                               if sample_weights is None
                               else np.asarray(sample_weights, np.float32))
        self.batch_size = batch_size

    def __len__(self):
        return max(1, int(np.ceil(len(self.X) / self.batch_size)))

    def __getitem__(self, idx):
        sel = np.random.randint(0, len(self.X), self.batch_size)
        return self.X[sel], self.y[sel], self.sample_weights[sel]
