"""Device-side wire-format decode: DXT1/DXT5 color + compressed depth.

The reference uploads the RAW stream bytes to the GPU and lets the
hardware do the decompression — GL samples S3TC textures natively
(TextureArray with compressed storage, NetKinectArray.cpp:118-126) and
compressed u8 depth is decoded in-shader (pre_depth.fs:51-61). The TPU
equivalent decodes on device with integer vector ops.

Why it matters here: the host->device link is the app loop's bottleneck
(measured 20-34 MB/s through the remote tunnel, docs/PERF.md r5). Decoded
f32 frames are ~14 MB; the wire payload (DXT1 color + u8 depth) is
~1.3 MB — a 10x cut that moves the ingest ceiling from ~2-4 fps to the
device frame rate. On production hosts (PCIe) the same path saves memory
bandwidth and host decode CPU.

Bit-exactness: the DXT block decode is pure integer math — identical to
the numpy oracle (io/dxt.py) and the native C++ decoder; parity-tested in
tests/test_io.py. Palette selection uses comparison-selects, not gathers
(gathers serialize on TPU).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _expand565(c):
    """u16-as-int32 [..] RGB565 -> 3 int32 channels with bit replication
    (matches io/dxt._expand565)."""
    r = (c >> 11) & 0x1F
    g = (c >> 5) & 0x3F
    b = c & 0x1F
    r = (r << 3) | (r >> 2)
    g = (g << 2) | (g >> 4)
    b = (b << 3) | (b >> 2)
    return r, g, b


def _decode_color_blocks(raw, force4: bool):
    """raw i32[K, N, 8] (u8 values) -> i32[K, N, 16, 3] texel colors."""
    c0 = raw[..., 0] | (raw[..., 1] << 8)
    c1 = raw[..., 2] | (raw[..., 3] << 8)
    p0 = jnp.stack(_expand565(c0), -1)           # [K, N, 3]
    p1 = jnp.stack(_expand565(c1), -1)
    if force4:
        four = jnp.ones(c0.shape, bool)
    else:
        four = c0 > c1
    p2 = jnp.where(four[..., None], (2 * p0 + p1) // 3, (p0 + p1) // 2)
    p3 = jnp.where(four[..., None], (p0 + 2 * p1) // 3, 0)

    # 2-bit indices from the u32 word, one texel at a time (static shifts)
    bits = (raw[..., 4] | (raw[..., 5] << 8) | (raw[..., 6] << 16)
            | (raw[..., 7] << 24))
    texels = []
    for i in range(16):
        idx = (bits >> (2 * i)) & 0x3            # [K, N]
        t = jnp.where(
            (idx == 0)[..., None], p0,
            jnp.where((idx == 1)[..., None], p1,
                      jnp.where((idx == 2)[..., None], p2, p3)),
        )
        texels.append(t)
    return jnp.stack(texels, axis=-2)            # [K, N, 16, 3]


def _assemble(texels, width: int, height: int):
    """[K, N, 16, 3] -> [K, H, W, 3] (row-major 4x4 blocks)."""
    k = texels.shape[0]
    bw, bh = width // 4, height // 4
    img = texels.reshape(k, bh, bw, 4, 4, 3)
    return img.transpose(0, 1, 3, 2, 4, 5).reshape(k, height, width, 3)


def decode_dxt1_device(payload, width: int, height: int):
    """payload u8[K, W*H/2] -> f32[K, H, W, 3] in [0, 1]."""
    k = payload.shape[0]
    n = (width // 4) * (height // 4)
    raw = payload[:, : n * 8].reshape(k, n, 8).astype(jnp.int32)
    img = _assemble(_decode_color_blocks(raw, force4=False), width, height)
    return img.astype(jnp.float32) / 255.0


def decode_dxt5_device(payload, width: int, height: int):
    """payload u8[K, W*H] -> f32[K, H, W, 3] (alpha dropped, like the
    replay path — NetKinectArray samples only rgb)."""
    k = payload.shape[0]
    n = (width // 4) * (height // 4)
    raw = payload[:, : n * 16].reshape(k, n, 16)[..., 8:].astype(jnp.int32)
    img = _assemble(_decode_color_blocks(raw, force4=True), width, height)
    return img.astype(jnp.float32) / 255.0


def decode_depth_u8_device(payload, width: int, height: int,
                           near: float = 0.5, far: float = 4.5):
    """Compressed u8 depth -> f32[K, H, W] meters (the pre_depth.fs:51-61
    mapping; same op order as FrameFormat.decode_depth)."""
    k = payload.shape[0]
    d_c = payload.reshape(k, height, width).astype(jnp.float32) / 255.0
    scale = far - near
    scaled_near = scale / 255.0
    out = (d_c * d_c + 0.15 * scaled_near) * scale + near
    return jnp.where(d_c < scaled_near, 0.0, out)


def decode_depth_f32_device(payload, width: int, height: int):
    """Raw f32 depth bytes -> f32[K, H, W] (little-endian bitcast)."""
    k = payload.shape[0]
    return jax.lax.bitcast_convert_type(
        payload.reshape(k, height, width, 4), jnp.float32
    )


def make_wire_decoder(fmt):
    """Jitted (color_payload, depth_payload) -> (depth f32[K,H,W] m,
    color f32[K,Hc,Wc,3]) for a FrameFormat — the device-side equivalent
    of StreamReader's host decode."""

    def decode(color_payload, depth_payload):
        if fmt.compressed_rgb == 1:
            color = decode_dxt1_device(color_payload, fmt.width_c, fmt.height_c)
        elif fmt.compressed_rgb == 5:
            color = decode_dxt5_device(color_payload, 640, 480)
        else:
            k = color_payload.shape[0]
            color = color_payload.reshape(
                k, fmt.height_c, fmt.width_c, 3
            ).astype(jnp.float32) / 255.0
        if fmt.compressed_depth:
            depth = decode_depth_u8_device(depth_payload, fmt.width, fmt.height)
        else:
            depth = decode_depth_f32_device(depth_payload, fmt.width, fmt.height)
        return depth, color

    return jax.jit(decode)
