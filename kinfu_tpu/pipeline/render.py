"""Display rendering of the raycast model maps.

Parity: kernel_renderPhong / kernel_renderNormals (image_process.cu:137-221).
The reference works on BGR images (OpenCV); here channels are RGB, so the
Phong diffuse coefficient triple is reversed to keep the same colour.
Like the reference, the eye position passed in is the *world-frame* camera
translation while the vertex map is camera-frame — a reference frame-mixing
quirk kept for pixel parity.
"""

from __future__ import annotations

import jax.numpy as jnp

_KD_RGB = (0.580, 0.4745, 0.3843)  # reversed uchar3 kd (image_process.cu:182)
_LIGHT_POS = (500.0, 500.0, -500.0)
_LIGHT_INTENSITY = 0.9
_AMBIENT = 0.1
_SPECULAR = 0.5
_SHININESS = 10.0


def render_phong(
    eye_t: jnp.ndarray, vmap: jnp.ndarray, nmap: jnp.ndarray
) -> jnp.ndarray:
    """Blinn-Phong shading -> [H, W, 3] uint8."""
    valid = jnp.any(nmap != 0, axis=-1) & jnp.any(vmap != 0, axis=-1)

    light = jnp.asarray(_LIGHT_POS, dtype=jnp.float32)
    eye_dir = eye_t[None, None, :] - vmap
    light_dir = light[None, None, :] - vmap

    def norm(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)

    eye_dir = norm(eye_dir)
    light_dir = norm(light_dir)

    light_cos = jnp.abs(jnp.sum(nmap * light_dir, axis=-1))
    diffuse = jnp.asarray(_KD_RGB, dtype=jnp.float32)[None, None, :] * (
        _LIGHT_INTENSITY * light_cos
    )[..., None]

    h = norm(light_dir + eye_dir)
    h_cos = jnp.abs(jnp.sum(nmap * h, axis=-1))
    specular = (_SPECULAR * _LIGHT_INTENSITY * jnp.power(h_cos, _SHININESS))[..., None]

    color = jnp.minimum(1.0, _AMBIENT + diffuse + specular)
    out = (color * 255.0).astype(jnp.uint8)
    return jnp.where(valid[..., None], out, 0)


def render_normals(nmap: jnp.ndarray) -> jnp.ndarray:
    """abs(n) * 255 false-colour (image_process.cu:137-157)."""
    return (jnp.abs(nmap) * 255.0).astype(jnp.uint8)
