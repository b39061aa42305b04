"""Original DeepMind-style coarse/fine WaveRNN.

Re-design of models/deepmind_version.py in the reference (orphaned there:
no trainer uses it, kept for completeness — SURVEY.md §2.1 #5). The
dual-softmax cell splits the hidden state into coarse/fine halves; the
fine half is conditioned on the current step's sampled coarse value. The
reference's python generation loop (deepmind_version.py:100-160) becomes
one `lax.scan` with both categorical samples drawn on device.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn



def combine_signal(coarse: np.ndarray, fine: np.ndarray) -> np.ndarray:
    """16-bit signal from 8-bit coarse/fine components."""
    signal = coarse.astype(np.int64) * 256 + fine.astype(np.int64)
    return (signal.astype(np.float32) / 32767.5) - 1.0


def split_signal(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    unsigned = ((x + 1.0) * 32767.5).astype(np.int64)
    coarse = unsigned // 256
    fine = unsigned % 256
    return coarse, fine


class DeepMindWaveRNN(nn.Module):
    hidden_size: int = 896
    quantisation: int = 256

    @property
    def split_size(self) -> int:
        return self.hidden_size // 2

    def setup(self) -> None:
        h, s = self.hidden_size, self.split_size
        self.R = nn.Dense(3 * h, use_bias=False)
        self.O1 = nn.Dense(s)
        self.O2 = nn.Dense(self.quantisation)
        self.O3 = nn.Dense(s)
        self.O4 = nn.Dense(self.quantisation)
        self.I_coarse = nn.Dense(3 * s, use_bias=False)
        self.I_fine = nn.Dense(3 * s, use_bias=False)
        zeros = nn.initializers.zeros
        self.bias_u = self.param('bias_u', zeros, (h,))
        self.bias_r = self.param('bias_r', zeros, (h,))
        self.bias_e = self.param('bias_e', zeros, (h,))

    def __call__(self, prev_y: jnp.ndarray, prev_hidden: jnp.ndarray,
                 current_coarse: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Teacher-forced step (deepmind_version.py:38-73). prev_y (B, 2)
        scaled [-1,1] coarse/fine, current_coarse (B, 1)."""
        s = self.split_size
        R_hidden = self.R(prev_hidden)
        R_u, R_r, R_e = jnp.split(R_hidden, 3, axis=1)

        I_cu, I_cr, I_ce = jnp.split(self.I_coarse(prev_y), 3, axis=1)
        fine_input = jnp.concatenate([prev_y, current_coarse], axis=1)
        I_fu, I_fr, I_fe = jnp.split(self.I_fine(fine_input), 3, axis=1)

        I_u = jnp.concatenate([I_cu, I_fu], axis=1)
        I_r = jnp.concatenate([I_cr, I_fr], axis=1)
        I_e = jnp.concatenate([I_ce, I_fe], axis=1)

        u = jax.nn.sigmoid(R_u + I_u + self.bias_u)
        r = jax.nn.sigmoid(R_r + I_r + self.bias_r)
        e = jnp.tanh(r * R_e + I_e + self.bias_e)
        hidden = u * prev_hidden + (1.0 - u) * e

        hidden_coarse, hidden_fine = hidden[:, :s], hidden[:, s:]
        out_coarse = self.O2(nn.relu(self.O1(hidden_coarse)))
        out_fine = self.O4(nn.relu(self.O3(hidden_fine)))
        return out_coarse, out_fine, hidden

    def generate(self, seq_len: int, key: jax.Array, batch_size: int = 1
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Unconditional generation as a lax.scan
        (deepmind_version.py:76-166). Returns (coarse, fine) int sequences
        (B, seq_len); combine with `combine_signal`."""
        s = self.split_size
        b_cu, b_fu = self.bias_u[:s], self.bias_u[s:]
        b_cr, b_fr = self.bias_r[:s], self.bias_r[s:]
        b_ce, b_fe = self.bias_e[:s], self.bias_e[s:]

        # touch submodules once so params exist before the scan
        dummy = jnp.zeros((batch_size, 2))
        _ = self(dummy, jnp.zeros((batch_size, self.hidden_size)),
                 jnp.zeros((batch_size, 1)))

        keys = jax.random.split(key, seq_len)

        def step(carry, k):
            out_c, out_f, hidden = carry
            k1, k2 = jax.random.split(k)
            hidden_coarse, hidden_fine = hidden[:, :s], hidden[:, s:]

            prev = jnp.stack([out_c, out_f], axis=1) / 127.5 - 1.0
            I_cu, I_cr, I_ce = jnp.split(self.I_coarse(prev), 3, axis=1)
            R_hidden = self.R(hidden)
            R_cu, R_fu, R_cr, R_fr, R_ce, R_fe = jnp.split(R_hidden, 6,
                                                           axis=1)

            u = jax.nn.sigmoid(R_cu + I_cu + b_cu)
            r = jax.nn.sigmoid(R_cr + I_cr + b_cr)
            e = jnp.tanh(r * R_ce + I_ce + b_ce)
            hidden_coarse = u * hidden_coarse + (1.0 - u) * e

            logits_c = self.O2(nn.relu(self.O1(hidden_coarse)))
            out_c_new = jax.random.categorical(k1, logits_c, axis=-1)

            coarse_pred = out_c_new.astype(jnp.float32) / 127.5 - 1.0
            fine_input = jnp.concatenate([prev, coarse_pred[:, None]],
                                         axis=1)
            I_fu, I_fr, I_fe = jnp.split(self.I_fine(fine_input), 3, axis=1)

            u = jax.nn.sigmoid(R_fu + I_fu + b_fu)
            r = jax.nn.sigmoid(R_fr + I_fr + b_fr)
            e = jnp.tanh(r * R_fe + I_fe + b_fe)
            hidden_fine = u * hidden_fine + (1.0 - u) * e

            logits_f = self.O4(nn.relu(self.O3(hidden_fine)))
            out_f_new = jax.random.categorical(k2, logits_f, axis=-1)

            hidden = jnp.concatenate([hidden_coarse, hidden_fine], axis=1)
            return ((out_c_new.astype(jnp.float32),
                     out_f_new.astype(jnp.float32), hidden),
                    (out_c_new, out_f_new))

        carry0 = (jnp.zeros((batch_size,)), jnp.zeros((batch_size,)),
                  jnp.zeros((batch_size, self.hidden_size)))
        _, (coarse, fine) = jax.lax.scan(step, carry0, keys)
        return jnp.swapaxes(coarse, 0, 1), jnp.swapaxes(fine, 0, 1)
