"""Per-channel volume normalization.

Mirrors the reference's `MultiChannelScaler` surface
(`mpunet/preprocessing/scaling.py`: sklearn scaler name -> per-channel fit,
`ignore_less_eq` fit masking), with one TPU-critical addition: for affine
scalers (Standard/MinMax/MaxAbs/Robust) the fitted transform is exposed as
per-channel ``(center, scale)`` vectors via `affine_params()`. Affine scaling
commutes with linear/nearest interpolation, so the framework scales each
volume ONCE when staging it to device instead of re-scaling every sampled
slice on the host like the reference does
(`mpunet/sequences/isotrophic_live_view_sequence.py:141-142`).
"""

from __future__ import annotations

import numpy as np
import sklearn.preprocessing as skl_preprocessing

# Scalers whose transform is x -> (x - center) / scale per channel
_AFFINE_SCALERS = {
    "StandardScaler",
    "MinMaxScaler",
    "MaxAbsScaler",
    "RobustScaler",
}


def assert_scaler(scaler):
    """True if `scaler` names a valid sklearn.preprocessing scaler class."""
    return isinstance(getattr(skl_preprocessing, str(scaler), None), type)


def get_scaler(scaler, *args, ignore_less_eq=None, **kwargs):
    if not assert_scaler(scaler):
        raise ValueError(f"Unknown scaler '{scaler}'")
    cls = getattr(skl_preprocessing, scaler)
    return MultiChannelScaler(cls, *args, ignore_less_eq=ignore_less_eq, **kwargs)


def apply_scaling(X, scaler, ignore_less_eq=None):
    """Fit a fresh scaler to X and return the transformed volume."""
    return get_scaler(scaler, ignore_less_eq=ignore_less_eq).fit_transform(X)


class MultiChannelScaler:
    """Fits one sklearn scaler per channel of a rank-4 (X, Y, Z, C) volume."""

    def __init__(self, scaler, *args, ignore_less_eq=None, **kwargs):
        self.scaler_class = scaler
        self.scaler_args = args
        self.scaler_kwargs = kwargs
        self.ignore_less_eq = ignore_less_eq
        self.scalers = []
        self.n_channels = None

    def __str__(self):
        return (f"MultiChannelScaler(scaler_class='{self.scaler_class.__name__}', "
                f"ignore_less_eq={self.ignore_less_eq})")

    __repr__ = __str__

    @property
    def is_affine(self):
        return self.scaler_class.__name__ in _AFFINE_SCALERS

    def fit(self, X, *args, **kwargs):
        if X.ndim != 4:
            raise ValueError(f"Expected rank-4 (X,Y,Z,C) volume, got {X.shape}")
        self.n_channels = X.shape[-1]
        ile = self.ignore_less_eq
        if ile is not None and not isinstance(ile, (list, tuple, np.ndarray)):
            ile = [ile] * self.n_channels
        if ile is not None and len(ile) != self.n_channels:
            raise ValueError(
                f"ignore_less_eq must have one entry per channel, got {ile}"
            )
        self.ignore_less_eq = ile
        self.scalers = []
        for c in range(self.n_channels):
            sc = self.scaler_class(*self.scaler_args, **self.scaler_kwargs)
            xc = X[..., c]
            if ile is not None:
                xc = xc[xc > ile[c]]
            sc.fit(xc.reshape(-1, 1), *args, **kwargs)
            self.scalers.append(sc)
        return self

    def transform(self, X, *args, **kwargs):
        if X.shape[-1] != self.n_channels:
            raise ValueError(
                f"Input has {X.shape[-1]} channels, scaler fit to {self.n_channels}"
            )
        center, scale = self.affine_params()
        if center is not None:
            # Fast fused path (avoids per-channel reshape round-trips)
            return ((X - center) / scale).astype(X.dtype, copy=False)
        out = np.empty_like(X)
        for c in range(self.n_channels):
            flat = self.scalers[c].transform(X[..., c].reshape(-1, 1), *args, **kwargs)
            out[..., c] = flat.reshape(X.shape[:-1])
        return out

    def fit_transform(self, X, *args, **kwargs):
        return self.fit(X, *args, **kwargs).transform(X)

    def affine_params(self):
        """Per-channel (center, scale) float32 vectors, or (None, None) when
        the underlying scaler is not an affine transform."""
        if not self.is_affine or not self.scalers:
            return None, None
        centers, scales = [], []
        for sc in self.scalers:
            name = type(sc).__name__
            if name == "StandardScaler":
                c = float(sc.mean_[0]) if sc.mean_ is not None else 0.0
                s = float(sc.scale_[0]) if sc.scale_ is not None else 1.0
            elif name == "RobustScaler":
                c = float(sc.center_[0]) if sc.center_ is not None else 0.0
                s = float(sc.scale_[0]) if sc.scale_ is not None else 1.0
            elif name == "MinMaxScaler":
                # x' = x * scale_ + min_  ->  (x - (-min_/scale_)) / (1/scale_)
                c = -float(sc.min_[0]) / float(sc.scale_[0])
                s = 1.0 / float(sc.scale_[0])
            elif name == "MaxAbsScaler":
                c = 0.0
                s = float(sc.scale_[0])
            else:  # pragma: no cover
                return None, None
            centers.append(c)
            scales.append(s)
        return (np.asarray(centers, np.float32), np.asarray(scales, np.float32))


class NoOpScaler:
    """Stand-in used when `scaler: Null` is configured."""

    n_channels = None

    def fit(self, X, *a, **k):
        self.n_channels = X.shape[-1]
        return self

    def transform(self, X, *a, **k):
        return X

    def fit_transform(self, X, *a, **k):
        return self.fit(X).transform(X)

    def affine_params(self):
        n = self.n_channels or 1
        return np.zeros(n, np.float32), np.ones(n, np.float32)

    def __str__(self):
        return "NoOpScaler()"

    __repr__ = __str__
