"""FLAME sequence visualisation: vertices -> normal-map video.

Equivalent of ``FlameVisualizer``
(/root/reference/visualize/flame_visualization.py:54-177): orthographically
project vertex sequences with a fixed camera, rasterize normal maps in
frame chunks, write an mp4 (ffmpeg subprocess when available, else PNG
frames) and optionally mux audio.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..core.projection import batch_orth_proj
from .rasterizer import render_normal_maps


from .pngio import write_png as _write_png  # noqa: E402 (kept name for callers)


def save_frames_as_video(
    frames: Sequence[np.ndarray],  # list of (H, W, 3) uint8
    out_path: str,
    fps: int = 25,
    audio_path: Optional[str] = None,
) -> str:
    """mp4 via ffmpeg if present; falls back to a PNG frame directory."""
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        frame_dir = os.path.splitext(out_path)[0] + "_frames"
        os.makedirs(frame_dir, exist_ok=True)
        for i, fr in enumerate(frames):
            _write_png(os.path.join(frame_dir, f"{i:06d}.png"), fr)
        return frame_dir
    with tempfile.TemporaryDirectory() as td:
        for i, fr in enumerate(frames):
            _write_png(os.path.join(td, f"{i:06d}.png"), fr)
        cmd = [ffmpeg, "-y", "-framerate", str(fps), "-i",
               os.path.join(td, "%06d.png")]
        if audio_path and os.path.exists(audio_path):
            cmd += ["-i", audio_path, "-c:a", "aac", "-shortest"]
        cmd += ["-pix_fmt", "yuv420p", out_path]
        subprocess.run(cmd, check=True, capture_output=True)
    return out_path


class FlameVisualizer:
    """Render (T, V, 3) vertex sequences as normal-map videos."""

    def __init__(self, faces: np.ndarray, image_size: int = 256,
                 camera: Sequence[float] = (8.0, 0.0, -0.01), frame_chunk: int = 16):
        self.faces = jnp.asarray(faces)
        self.image_size = image_size
        self.camera = jnp.asarray([list(camera)], jnp.float32)
        self.frame_chunk = frame_chunk

    def render_verts(self, verts) -> np.ndarray:
        """(T, V, 3) model-space vertices -> (T, H, W, 3) float images."""
        verts = jnp.asarray(verts)
        T = verts.shape[0]
        out = []
        for s in range(0, T, self.frame_chunk):
            v = verts[s : s + self.frame_chunk]
            cam = jnp.broadcast_to(self.camera, (v.shape[0], 3))
            proj = batch_orth_proj(v, cam)
            # flip y to image convention, negate z so depth grows away from
            # the camera (DECA convention)
            ndc = jnp.stack(
                [proj[..., 0], -proj[..., 1], -proj[..., 2]], axis=-1
            )
            imgs = render_normal_maps(
                ndc, self.faces, self.image_size, self.image_size
            )
            out.append(np.asarray(imgs))
        return np.concatenate(out, axis=0)

    def visualize_verts(
        self, verts, save_path: str, fps: int = 25,
        audio_path: Optional[str] = None,
    ) -> str:
        imgs = self.render_verts(verts)
        frames = [(np.clip(f, 0, 1) * 255).astype(np.uint8) for f in imgs]
        return save_frames_as_video(frames, save_path, fps, audio_path)


class FixedViewRenderer:
    """Multi-fixed-view shaded rendering of FLAME vertex sequences.

    Equivalent of EMOTE's FixedViewFlameRenderer
    (inferno/models/temporal/Renderers.py:244-343): a fixed set of
    camera/pose buffers renders every frame from each view; an optional
    mouth crop box supports the lip-reading consistency loss.
    """

    def __init__(self, faces, image_size: int = 224,
                 cams=((8.0, 0.0, -0.01),), mouth_crop=(0.45, 0.85, 0.25, 0.75)):
        import numpy as _np

        self.faces = jnp.asarray(faces)
        self.image_size = image_size
        self.cams = jnp.asarray(_np.asarray(cams, _np.float32))
        self.mouth_crop = mouth_crop

    def render_jax(self, verts, view: int = 0) -> jax.Array:
        """(T, V, 3) -> (T, H, W, 3), jittable + differentiable (gradients
        flow through shading/interpolation, as with the reference's
        pytorch3d render losses)."""
        from .shading import render_shaded

        verts = jnp.asarray(verts)
        cam = jnp.broadcast_to(self.cams[view : view + 1], (verts.shape[0], 3))
        proj = batch_orth_proj(verts, cam)
        ndc = jnp.stack([proj[..., 0], -proj[..., 1], -proj[..., 2]], axis=-1)
        return render_shaded(ndc, self.faces, self.image_size, self.image_size)

    def render(self, verts) -> "np.ndarray":
        """(T, V, 3) -> (n_views, T, H, W, 3) SH-shaded images."""
        verts = jnp.asarray(verts)
        return np.stack(
            [
                np.asarray(self.render_jax(verts, ci))
                for ci in range(self.cams.shape[0])
            ]
        )

    def crop_mouth(self, images: "np.ndarray") -> "np.ndarray":
        """(..., H, W, C) -> the fixed mouth box (lip-reading input crop)."""
        h0, h1, w0, w1 = self.mouth_crop
        H, W = images.shape[-3:-1]
        return images[..., int(h0 * H) : int(h1 * H), int(w0 * W) : int(w1 * W), :]
