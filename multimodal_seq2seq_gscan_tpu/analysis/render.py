"""Headless RGB rasterizer for situations (replaces the PyQt5 renderer).

Draws the same scene the reference renders (gym_minigrid/rendering.py +
minigrid.py:304-378,705-760): white background, grey grid lines, size-scaled
colored shapes, the agent as a pink triangle pointing in its heading, and
optional attention shading of cells — but with PIL, no display server needed.
"""

import math
from typing import List, Optional, Sequence

import numpy as np
from PIL import Image, ImageDraw

from multimodal_seq2seq_gscan_tpu.gscan.types import (
    DIR_TO_INT, Position, Situation)

CELL_PIXELS = 60

# Rendering palette (same RGB constants the reference renderer uses).
COLORS = {
    "red": (128, 0, 0),
    "green": (46, 139, 87),
    "blue": (25, 25, 112),
    "purple": (112, 39, 195),
    "yellow": (255, 191, 0),
    "grey": (100, 100, 100),
    "pink": (255, 192, 203),
}

AGENT_COLOR = (255, 192, 203)
GRID_LINE_COLOR = (100, 100, 100)


def _draw_object(draw: ImageDraw.ImageDraw, shape: str, color: str, size: int,
                 col: int, row: int):
    x0 = col * CELL_PIXELS
    y0 = row * CELL_PIXELS
    rgb = COLORS.get(color, COLORS["grey"])
    scale = size / 4.0
    if shape == "square":
        side = CELL_PIXELS * scale
        draw.polygon([(x0, y0), (x0 + side, y0), (x0 + side, y0 + side),
                      (x0, y0 + side)], fill=rgb, outline=rgb)
    elif shape == "circle":
        radius = (CELL_PIXELS // 10) * size
        cx = x0 + CELL_PIXELS * 0.5
        cy = y0 + CELL_PIXELS * 0.5
        draw.ellipse([cx - radius, cy - radius, cx + radius, cy + radius],
                     fill=rgb, outline=rgb)
    elif shape == "cylinder":
        half_width = (CELL_PIXELS / 2) * scale
        height = CELL_PIXELS * scale
        mid = x0 + CELL_PIXELS / 2
        draw.polygon([(mid, y0), (mid + half_width, y0),
                      (mid, y0 + height), (mid - half_width, y0 + height)],
                     fill=rgb, outline=rgb)
    else:
        raise ValueError("Unknown shape to render: {}".format(shape))


def _draw_agent(draw: ImageDraw.ImageDraw, col: int, row: int, direction: int):
    cx = CELL_PIXELS * (col + 0.5)
    cy = CELL_PIXELS * (row + 0.5)
    angle = math.radians(direction * 90)
    cos_a, sin_a = math.cos(angle), math.sin(angle)
    base = [(-12, 10), (12, 0), (-12, -10)]
    points = [(cx + x * cos_a - y * sin_a, cy + x * sin_a + y * cos_a)
              for x, y in base]
    draw.polygon(points, fill=AGENT_COLOR, outline=AGENT_COLOR)


def render_situation(situation: Situation,
                     attention_weights: Optional[Sequence[float]] = None
                     ) -> np.ndarray:
    """Render a situation to an RGB uint8 array [grid*60, grid*60, 3]."""
    grid = situation.grid_size
    size_px = grid * CELL_PIXELS
    image = Image.new("RGB", (size_px, size_px), (255, 255, 255))
    draw = ImageDraw.Draw(image)

    # Attention shading: darker cell = higher weight.
    if attention_weights is not None and len(attention_weights) > 0:
        weights = np.asarray(attention_weights, dtype=np.float32).reshape(
            grid, grid)
        for r in range(grid):
            for c in range(grid):
                shade = int(150 * (1 - float(weights[r, c])))
                draw.rectangle([c * CELL_PIXELS, r * CELL_PIXELS,
                                (c + 1) * CELL_PIXELS, (r + 1) * CELL_PIXELS],
                               fill=(shade, shade, shade))

    for line in range(grid + 1):
        offset = line * CELL_PIXELS
        draw.line([(0, offset), (size_px, offset)], fill=GRID_LINE_COLOR)
        draw.line([(offset, 0), (offset, size_px)], fill=GRID_LINE_COLOR)

    for positioned_object in situation.placed_objects:
        _draw_object(draw, positioned_object.object.shape,
                     positioned_object.object.color,
                     positioned_object.object.size,
                     positioned_object.position.column,
                     positioned_object.position.row)

    _draw_agent(draw, situation.agent_pos.column, situation.agent_pos.row,
                DIR_TO_INT[situation.agent_direction])
    return np.asarray(image, dtype=np.uint8)


def save_situation_png(situation: Situation, path: str,
                       attention_weights: Optional[Sequence[float]] = None
                       ) -> str:
    array = render_situation(situation, attention_weights)
    Image.fromarray(array).save(path)
    return path


def save_gif(frames: List[np.ndarray], path: str, fps: int = 5) -> str:
    images = [Image.fromarray(frame) for frame in frames]
    duration_ms = int(1000 / fps)
    images[0].save(path, save_all=True, append_images=images[1:],
                   duration=duration_ms, loop=0)
    return path
