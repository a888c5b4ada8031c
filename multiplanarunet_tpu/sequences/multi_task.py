"""Multi-task sequence wrapper (parity: `mpunet/sequences/multi_task_sequence.py`):
__getitem__ returns per-task batch lists; attribute get/set broadcast to the
wrapped per-task sequences."""

from __future__ import annotations

from multiplanarunet_tpu.sequences.base_sequence import BaseSequence


class MultiTaskSequence(BaseSequence):
    def __init__(self, sequencers, task_names, no_log=False, logger=None):
        # Assign via object.__setattr__ to dodge the broadcast __setattr__
        object.__setattr__(self, "sequences", list(sequencers))
        object.__setattr__(self, "task_names", list(task_names))
        if not no_log and logger:
            logger(f"MultiTaskSequence over tasks: {self.task_names}")

    def __len__(self):
        return int(1e12)

    def __getitem__(self, idx):
        xs, ys, ws = [], [], []
        for seq in self.sequences:
            x, y, w = seq[idx]
            xs.append(x)
            ys.append(y)
            ws.append(w)
        return xs, ys, ws

    def __getattr__(self, name):
        # Fall back to the first child's attribute
        return getattr(self.sequences[0], name)

    def __setattr__(self, name, value):
        # Broadcast attribute assignment to all children
        for seq in self.sequences:
            setattr(seq, name, value)
