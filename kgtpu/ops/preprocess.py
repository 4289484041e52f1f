"""On-device image preprocessing.  [SURVEY.md C3; §3.4 rebuild]

The reference normalizes images on the host inside its DataLoader workers.
Round-2 profiling showed that host-side normalize + color jitter cost
~385 ms/sample on a 1-core host — 100× the device time of the same math —
so the float work moves into the jitted programs: the host ships uint8
pixels (4× smaller transfers) plus two per-image jitter scalars, and this
op runs as fused elementwise XLA that disappears into the first conv's HBM
read.

Contract: every jitted entry point (train step, all inference builders)
takes RAW images — uint8 or float in [0, 255] — and calls
`normalize_images` itself.  Nothing outside a jit normalizes pixels.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize_images(
    images: jnp.ndarray,
    mean: tuple[float, float, float],
    std: tuple[float, float, float],
    gain: jnp.ndarray | None = None,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Raw pixels → normalized float32.

    Args:
      images: [..., H, W, 3] uint8 or float in [0, 255].
      mean, std: per-channel normalization constants (0-1 scale).
      gain, bias: optional per-image color jitter, shaped [..., 3] matching
        the leading axes of `images` (e.g. [B, 3] for a batch) — applied as
        clip(x * gain + bias, 0, 255) before normalization, replacing the
        reference's host-side jitter (without its uint8 re-quantization).

    Returns:
      float32 array, (x/255 - mean) / std.
    """
    x = images.astype(jnp.float32)
    if gain is not None:
        g = gain.astype(jnp.float32)[..., None, None, :]
        b = (jnp.zeros_like(gain) if bias is None
             else bias).astype(jnp.float32)[..., None, None, :]
        x = jnp.clip(x * g + b, 0.0, 255.0)
    x = x / 255.0
    m = jnp.asarray(mean, jnp.float32)
    s = jnp.asarray(std, jnp.float32)
    return (x - m) / s
