"""Precomputed view/attack/move range masks.

Numerically replicates the reference mask generators
(reference: src/gridworld/Range.h:104-190) so that action-space layouts and
observation masks are identical:

- a range is a small (height, width) boolean mask plus the row-major list of
  in-range cell offsets ``(dx, dy)`` relative to the range "eye"
- ``num2delta`` order (== attack/move action numbering) is row-major scan order
- parity of the mask follows the parity of the agent body width so the mask is
  center-symmetric

Everything here is plain numpy computed once at config time; the resulting
tables are baked into the compiled GameSpec as static constants.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

_EPS_CIRCLE = 1e-8
_EPS_SECTOR = 1e-5


@dataclasses.dataclass(frozen=True)
class RangeMask:
    """A precomputed range: boolean mask + delta tables.

    Attributes
    ----------
    mask : (height, width) bool array, True for in-range cells
    dx, dy : (count,) int arrays, offsets of in-range cells in row-major order
    x1, y1, x2, y2 : relative offsets of the mask rectangle w.r.t. the eye
        (reference: Range::get_range_rela_offset, src/gridworld/Range.h:51-54)
    """

    mask: np.ndarray
    dx: np.ndarray
    dy: np.ndarray
    x1: int
    y1: int
    x2: int
    y2: int

    @property
    def width(self) -> int:
        return int(self.mask.shape[1])

    @property
    def height(self) -> int:
        return int(self.mask.shape[0])

    @property
    def count(self) -> int:
        return int(self.dx.shape[0])

    def num2delta(self, n: int) -> tuple[int, int]:
        return int(self.dx[n]), int(self.dy[n])

    def __hash__(self):
        return hash((self.mask.tobytes(), self.x1, self.y1, self.x2, self.y2))

    def __eq__(self, other):
        return (
            isinstance(other, RangeMask)
            and self.mask.shape == other.mask.shape
            and np.array_equal(self.mask, other.mask)
            and (self.x1, self.y1, self.x2, self.y2)
            == (other.x1, other.y1, other.x2, other.y2)
        )


def circle_range(radius: float, inner_radius: float, parity: int) -> RangeMask:
    """Circular range mask (reference: CircleRange, src/gridworld/Range.h:149-190).

    ``parity`` is the parity of the agent body width; even-width agents get an
    even-sized, half-cell-shifted mask.  Cells strictly inside ``radius`` and
    strictly outside ``inner_radius`` are in range.
    """
    width = 2 * int(radius + _EPS_CIRCLE) + parity
    center = int(radius)
    if width % 2 != parity:  # fit to parity, pick ceil (kept for fidelity)
        width += 1
    height = width

    mask = np.zeros((height, width), dtype=bool)
    dxs: list[int] = []
    dys: list[int] = []
    delta = 0.5 if parity == 0 else 0.0
    for i in range(height):
        for j in range(width):
            dis_x = abs(j - center + delta)
            dis_y = abs(i - center + delta)
            dis = math.sqrt(dis_x * dis_x + dis_y * dis_y)
            if dis < radius + _EPS_CIRCLE and dis > inner_radius - _EPS_CIRCLE:
                mask[i, j] = True
                dxs.append(j - center)
                dys.append(i - center)

    return RangeMask(
        mask=mask,
        dx=np.asarray(dxs, dtype=np.int32),
        dy=np.asarray(dys, dtype=np.int32),
        x1=-center,
        y1=-center,
        x2=width - center - 1,
        y2=width - center - 1,
    )


def sector_range(angle: float, radius: float, parity: int) -> RangeMask:
    """Sector (fan) range mask (reference: SectorRange, src/gridworld/Range.h:104-144).

    The sector points "up" (negative dy); the eye sits one row below the mask.
    Only supported for angle < 180.
    """
    height = int(radius + 0.5)
    width = int(2 * radius * math.sin(angle / 2 * (math.pi / 180)) + 0.5)
    if width % 2 != parity:  # fit to parity, pick ceil
        width -= 1
    width = max(width, 0)
    height = max(height, 0)

    mask = np.zeros((height, width), dtype=bool)
    dxs: list[int] = []
    dys: list[int] = []
    tan_half = math.tan(angle / 2 * math.pi / 180)
    for i in range(height):
        for j in range(width):
            dis_x = abs(j - (width - 1) / 2.0)
            dis_y = abs(height - i)
            dis = math.sqrt(dis_x * dis_x + dis_y * dis_y)
            if dis < radius + 0.2 + _EPS_SECTOR and dis_x / dis_y < tan_half + _EPS_SECTOR:
                mask[i, j] = True
                dxs.append(j - width // 2)
                dys.append(i - height)

    return RangeMask(
        mask=mask,
        dx=np.asarray(dxs, dtype=np.int32),
        dy=np.asarray(dys, dtype=np.int32),
        x1=-(width // 2),
        y1=-height,
        x2=(width - 1) // 2,
        y2=-1,
    )


def build_range(radius: float, angle: float, parity: int, inner: float = 0.0) -> RangeMask:
    """Dispatch on angle like the reference (AgentType.cc:85-103)."""
    if angle >= 180:
        if abs(angle - 360) > 1e-5:
            raise ValueError("only supports ranges with angle = 360, when angle > 180")
        return circle_range(radius, inner, parity)
    return sector_range(angle, radius, parity)
