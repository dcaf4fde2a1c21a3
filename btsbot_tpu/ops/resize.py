"""Bilinear resize matching torch's ``align_corners=False`` convention.

The reference MaxViT models bilinearly upsample 63×63 triplets to the
backbone's native resolution in-graph
(`/root/reference/btsbot/architectures.py:44-50,90-96`).  jax.image.resize
with the "linear" method uses half-pixel sample positions, which is the same
convention as ``torch.nn.functional.interpolate(mode='bilinear',
align_corners=False)``; the parity test in tests/test_ops.py verifies
agreement against torch to float32 tolerance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(images: jnp.ndarray, size: int) -> jnp.ndarray:
    """Resize NHWC batch to (N, size, size, C) with bilinear interpolation."""
    n, _, _, c = images.shape
    if images.shape[1] == size and images.shape[2] == size:
        return images
    return jax.image.resize(
        images, (n, size, size, c), method="linear", antialias=False
    )
