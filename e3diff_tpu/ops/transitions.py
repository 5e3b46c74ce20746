"""D3PM transition kernels: uniform and BLOSUM-tempered softmax.

Ports of sequence_model/utils.py:235-314. The BLOSUM kernel loads the
reference's published asset (original 20x20 substitution score matrix plus
two 500-entry temperature ladders), converted once to ``assets/blosum_substitute.npz``
by scripts/convert_blosum_asset.py.

Behavior-defining quirk (SURVEY.md Q3, replicated on purpose): every caller
in the reference passes **alpha_bar(t), not t/T**, as ``t_normal`` to
``get_Qt_bar`` (sequence_model/model.py:298-299, sample.py:156-159). Since
alpha_bar decreases with t while the temperature ladder increases with
index, small t maps to a near-uniform transition and t=T to near-identity.
These classes keep the reference call signature so the quirk lives at the
call sites, exactly as upstream.
"""

from __future__ import annotations

import dataclasses
import os

import jax.numpy as jnp
import jax.nn
import numpy as np

_ASSET_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "assets",
    "blosum_substitute.npz",
)


def load_blosum_asset(path: str | None = None) -> dict[str, np.ndarray]:
    """Load the converted BLOSUM asset: original_score [20,20],
    Qtb_temperature [500], Qt_temperature [500] (all float32)."""
    with np.load(path or _ASSET_PATH) as z:
        return {k: z[k].astype(np.float32) for k in z.files}


def interpolate_linear_align_corners(v: np.ndarray, out_size: int) -> np.ndarray:
    """1-D linear interpolation matching torch F.interpolate(align_corners=True).

    Output index j maps to input coordinate j*(in-1)/(out-1); reference uses
    this to stretch the 500-entry temperature ladders to T+1 = 501 entries
    (sequence_model/utils.py:286-290).
    """
    v = np.asarray(v, dtype=np.float64)
    in_size = v.shape[0]
    if out_size == in_size:
        return v.astype(np.float32)
    pos = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    i0 = np.clip(np.floor(pos).astype(np.int64), 0, in_size - 2)
    frac = pos - i0
    out = v[i0] * (1 - frac) + v[i0 + 1] * frac
    return out.astype(np.float32)


@dataclasses.dataclass(frozen=True)
class UniformTransition:
    """Uniform D3PM transition: Qt_bar = ab*I + (1-ab)/K * 1.

    Port of DiscreteUniformTransition (sequence_model/utils.py:235-271).
    Methods are jnp-traceable; `t` arguments may be (B,) or (B,1).
    """

    num_classes: int = 20

    def _bcast(self, x):
        x = jnp.asarray(x, dtype=jnp.float32).reshape(-1)
        return x[:, None, None]

    def get_Qt(self, beta_t):
        beta_t = self._bcast(beta_t)
        eye = jnp.eye(self.num_classes, dtype=jnp.float32)[None]
        u = jnp.full((1, self.num_classes, self.num_classes), 1.0 / self.num_classes)
        return beta_t * u + (1 - beta_t) * eye

    def get_Qt_bar(self, alpha_bar_t):
        alpha_bar_t = self._bcast(alpha_bar_t)
        eye = jnp.eye(self.num_classes, dtype=jnp.float32)[None]
        u = jnp.full((1, self.num_classes, self.num_classes), 1.0 / self.num_classes)
        return alpha_bar_t * eye + (1 - alpha_bar_t) * u


class BlosumTransition:
    """BLOSUM-tempered softmax transition kernel.

    Port of BlosumTransition (sequence_model/utils.py:273-314). The internal
    ``timestep`` defaults to 500 and is *not* overridden by reference callers
    even when the diffusion uses T=50 (quirk Q3 companion), so the lookup
    index is round(t_normal * 500) into the 501-interpolated ladder.

    Qt_bar rows: softmax(score / temperature, axis=-1) floored at 1e-6
    (floor applied after softmax, not renormalized — reference semantics).
    """

    def __init__(self, asset: dict[str, np.ndarray] | None = None,
                 num_classes: int = 20, timestep: int = 500):
        asset = asset or load_blosum_asset()
        self.num_classes = num_classes
        self.timestep = timestep
        self.original_score = jnp.asarray(asset["original_score"], dtype=jnp.float32)
        self.qtb_temperature = jnp.asarray(
            interpolate_linear_align_corners(asset["Qtb_temperature"], timestep + 1))
        self.qt_temperature = jnp.asarray(
            interpolate_linear_align_corners(asset["Qt_temperature"], timestep + 1))

    def _idx(self, t_normal):
        t = jnp.asarray(t_normal, dtype=jnp.float32).reshape(-1)
        return jnp.clip(jnp.round(t * self.timestep).astype(jnp.int32), 0, self.timestep)

    def get_Qt_bar(self, t_normal):
        temp = self.qtb_temperature[self._idx(t_normal)][:, None, None]
        q = jax.nn.softmax(self.original_score[None] / temp, axis=2)
        return jnp.maximum(q, 1e-6)

    def get_Qt(self, t_normal):
        temp = self.qt_temperature[self._idx(t_normal)][:, None, None]
        return jax.nn.softmax(self.original_score[None] / temp, axis=2)
