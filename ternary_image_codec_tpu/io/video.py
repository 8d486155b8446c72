"""Video writer bridge: words -> RGB frames (device decode) -> ffmpeg.

TPU-native redesign of the reference's libav wrapper
(include/video_writer_ffmpeg.hpp:16-349): frames are decoded to RGB on
device, streamed to an `ffmpeg` subprocess over a rawvideo stdin pipe (no
libav bindings needed).  When ffmpeg is absent the writer degrades to a
no-op stub that reports unavailability — the runtime analog of the
reference's `TERNARY_WITH_FFMPEG` compile gate (hpp:257-287) — and a PNG
sequence writer (+ popen-style assembler, old/src/io_video_ffmpeg.cpp:20-39)
covers the no-codec path.
"""
from __future__ import annotations

import dataclasses
import os
import shutil
import subprocess
from typing import List, Optional, Sequence

import numpy as np

from ..config import SubwordMode, std_res_for
from . import image as I


@dataclasses.dataclass
class FFVideoConfig:
    """include/video_writer_ffmpeg.hpp:16-26."""
    codec_name: str = "libx264"
    width: int = 0
    height: int = 0
    fps: float = 25.0
    crf: int = 23
    preset: str = "medium"
    gop: int = 50
    yuv444: bool = False


@dataclasses.dataclass
class FFVideoStats:
    """include/video_writer_ffmpeg.hpp:27-31."""
    frames_written: int = 0
    packets: int = 0


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


class FFVideoWriter:
    """Streaming writer; open() -> add_frame_* -> close().

    add_frame_words decodes on device via io.image.words_to_rgb.
    """

    def __init__(self) -> None:
        self._proc: Optional[subprocess.Popen] = None
        self._cfg: Optional[FFVideoConfig] = None
        self._stats = FFVideoStats()

    def open(self, out_path: str, cfg: FFVideoConfig) -> bool:
        self.close()
        if not ffmpeg_available():
            return False
        if cfg.width <= 0 or cfg.height <= 0:
            return False
        pix = "yuv444p" if cfg.yuv444 else "yuv420p"
        cmd = [
            "ffmpeg", "-y", "-loglevel", "error",
            "-f", "rawvideo", "-pix_fmt", "rgb24",
            "-s", f"{cfg.width}x{cfg.height}", "-r", str(cfg.fps),
            "-i", "pipe:0",
            "-c:v", cfg.codec_name, "-crf", str(cfg.crf),
            "-preset", cfg.preset, "-g", str(cfg.gop),
            "-pix_fmt", pix, out_path,
        ]
        try:
            self._proc = subprocess.Popen(cmd, stdin=subprocess.PIPE)
        except OSError:
            self._proc = None
            return False
        self._cfg = cfg
        self._stats = FFVideoStats()
        return True

    def add_frame_rgb(self, rgb: np.ndarray) -> bool:
        if self._proc is None or self._proc.stdin is None:
            return False
        rgb = np.ascontiguousarray(np.asarray(rgb, dtype=np.uint8))
        if rgb.shape != (self._cfg.height, self._cfg.width, 3):
            return False
        try:
            self._proc.stdin.write(rgb.tobytes())
        except (BrokenPipeError, OSError):
            return False
        self._stats.frames_written += 1
        self._stats.packets += 1  # one raw packet per frame on the pipe
        return True

    def add_frame_words(self, words, sub: SubwordMode, w: int, h: int,
                        codec: str = "word13") -> bool:
        rgb = I.words_to_rgb(words, sub, w, h, codec=codec)
        return self.add_frame_rgb(rgb)

    def add_frame_words_centered_in_canvas(self, words, inner_sub: SubwordMode,
                                           codec: str = "word13") -> bool:
        """Decode an inner-resolution frame and blit it centered into the S27
        canvas-sized output (hpp add_frame_words_centered_in_canvas)."""
        import jax.numpy as jnp
        from ..ops import quant as Q
        tw, th = std_res_for(inner_sub)
        rgb = I.words_to_rgb(words, inner_sub, tw, th, codec=codec)
        canvas = np.asarray(Q.blit_center(jnp.asarray(rgb),
                                          self._cfg.height, self._cfg.width))
        return self.add_frame_rgb(canvas)

    def stats(self) -> FFVideoStats:
        return self._stats

    def close(self) -> None:
        if self._proc is not None:
            try:
                if self._proc.stdin is not None:
                    self._proc.stdin.close()
                self._proc.wait(timeout=120)
            except (OSError, subprocess.TimeoutExpired):
                self._proc.kill()
            self._proc = None


def write_video_from_words_sequence(out_path: str, cfg: FFVideoConfig,
                                    frames: Sequence, sub: SubwordMode,
                                    w: int, h: int, codec: str = "word13"
                                    ) -> Optional[FFVideoStats]:
    """include/video_writer_ffmpeg.hpp:290-318; None == unavailable/failed."""
    wr = FFVideoWriter()
    if not wr.open(out_path, cfg):
        return None
    try:
        for f in frames:
            if not wr.add_frame_words(f, sub, w, h, codec=codec):
                return None
        return wr.stats()
    finally:
        wr.close()


def write_video_centered_in_canvas_from_rawN_sequence(
        out_path: str, cfg: FFVideoConfig, frames: Sequence,
        inner_sub: SubwordMode, codec: str = "word13"
) -> Optional[FFVideoStats]:
    """include/video_writer_ffmpeg.hpp:320-349."""
    wr = FFVideoWriter()
    if not wr.open(out_path, cfg):
        return None
    try:
        for f in frames:
            if not wr.add_frame_words_centered_in_canvas(f, inner_sub,
                                                         codec=codec):
                return None
        return wr.stats()
    finally:
        wr.close()


# ---------------------------------------------------------------------------
# PNG-sequence path (always available; old/src/io_video_ffmpeg.cpp parity)
# ---------------------------------------------------------------------------


def write_png_sequence_from_words(outdir: str, frames: Sequence,
                                  sub: SubwordMode, w: int, h: int,
                                  codec: str = "word13") -> List[str]:
    os.makedirs(outdir, exist_ok=True)
    paths = []
    for i, f in enumerate(frames):
        p = os.path.join(outdir, f"frame_{i:05d}.png")
        I.words_to_image_subword(f, sub, w, h, p, codec=codec)
        paths.append(p)
    return paths


def ffmpeg_from_png_pattern(pattern: str, out_path: str, fps: float = 30.0
                            ) -> bool:
    """Shell-out assembler (old/src/io_video_ffmpeg.cpp:20-39)."""
    if not ffmpeg_available():
        return False
    cmd = ["ffmpeg", "-y", "-loglevel", "error", "-framerate", str(fps),
           "-i", pattern, "-pix_fmt", "yuv420p", out_path]
    return subprocess.run(cmd, check=False).returncode == 0
