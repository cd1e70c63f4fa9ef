"""Reconstruction strategy base.

≙ the reference's abstract ``Reconstruction``
(framework/reconstruction/reconstruction.hpp:11-36): virtual draw(), a timed
``drawF`` wrapper (reconstruction.cpp:35-39), resize and color-mask plumbing.
Strategies here are thin stateful wrappers that own jitted pure functions;
``draw`` consumes preprocessed frames + a camera and returns an image.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
import jax.numpy as jnp

from ..calibration.rig import RigCalibration
from ..utils.math import Bbox
from ..utils.timers import TimerDatabase
from ..ops.preprocess import ProcessedFrames
from ..ops.raymarch import RenderCamera


@dataclass
class ReconContext:
    """Shared state every strategy receives (≙ the CalibrationFiles +
    CalibVolumes + NetKinectArray trio passed to every reference ctor)."""

    rig: RigCalibration
    bbox: Bbox
    width: int = 1280
    height: int = 720


class Reconstruction:
    name = "base"

    def __init__(self, ctx: ReconContext):
        self.ctx = ctx
        self.color_mask_mode = False
        self.viewport_offset = (0.0, 0.0)
        TimerDatabase.instance().add_timer(self.timer_name)

    @property
    def timer_name(self) -> str:
        return f"draw_{self.name}"

    def draw(self, frames: ProcessedFrames, cam: RenderCamera):
        raise NotImplementedError

    def draw_f(self, frames: ProcessedFrames, cam: RenderCamera):
        """Timed draw (≙ Reconstruction::drawF, reconstruction.cpp:35-39)."""
        db = TimerDatabase.instance()
        db.begin(self.timer_name)
        out = self.draw(frames, cam)
        db.end(self.timer_name, sync=out)
        return out

    def resize(self, width: int, height: int) -> None:
        self.ctx.width = width
        self.ctx.height = height

    def set_color_mask_mode(self, mode: bool) -> None:
        self.color_mask_mode = mode

    def set_viewport_offset(self, x: float, y: float) -> None:
        self.viewport_offset = (x, y)

    def reload(self) -> None:
        """≙ shader reload — jitted functions recompile lazily on next call."""
        import jax

        jax.clear_caches()
