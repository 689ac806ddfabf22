"""Model debug visualization — the TPU-native equivalent of the reference's
OpenCV `visualize_model` (include/carla/carla_model.h:336-552).

Same layout, rendered with PIL on the host (no cv2/X11 on TPU machines):
  left  — the BEV semantic observation colorized with the reference palette
  right — a measurement text panel on top of two action plots (steering,
          acceleration), each with green border/center guides, the Beta pdf
          drawn in yellow over x∈[0,1) at 0.001 granularity with the pdf
          clipped at y_max=25 (carla_model.h:382-388), and the chosen
          (scaled) action as a vertical yellow line
Everything is upscaled 4x (carla_model.h:372 upscale_factor) and written to
PNG instead of a cv window.
"""

from __future__ import annotations

import math

import numpy as np

# reference palette (carla_model.h:417-427), RGB
COLOR_BLUE = (0, 0, 255)
COLOR_GREEN = (0, 255, 0)
COLOR_YELLOW = (255, 255, 0)
COLOR_WHITE = (255, 255, 255)
COLOR_ALUMINIUM_3 = (136, 138, 133)
COLOR_ALUMINIUM_5 = (46, 52, 54)
Y_MAX = 25.0          # pdf clip (carla_model.h:383)
UPSCALE = 4           # carla_model.h:372


def beta_pdf(x: np.ndarray, a: float, b: float) -> np.ndarray:
    ln_beta = math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b)
    x = np.clip(x, 1e-6, 1 - 1e-6)
    return np.exp((a - 1) * np.log(x) + (b - 1) * np.log1p(-x) - ln_beta)


def colorize_bev(bev: np.ndarray) -> np.ndarray:
    """[H, W, C>=3] synthetic-driving semantics -> RGB uint8 [H, W, 3].

    Channel mapping mirrors the reference's mask->palette scheme
    (carla_model.h:430-470): drivable road in dark aluminium, lane marking
    white, ego/vehicle blue, on a black background.
    """
    h, w = bev.shape[:2]
    img = np.zeros((h, w, 3), np.uint8)
    img[bev[..., 0] > 0] = COLOR_ALUMINIUM_5
    if bev.shape[-1] > 1:
        img[bev[..., 1] > 0] = COLOR_WHITE
    if bev.shape[-1] > 2:
        img[bev[..., 2] > 0] = COLOR_BLUE
    return img


def _action_plot(draw, x0, y0, w, h, a: float, b: float, action01: float, label: str):
    draw.line([x0 + w // 2, y0, x0 + w // 2, y0 + h - 1], fill=COLOR_GREEN, width=2)
    draw.line([x0, y0, x0, y0 + h - 1], fill=COLOR_GREEN, width=2)
    draw.line([x0 + w - 1, y0, x0 + w - 1, y0 + h - 1], fill=COLOR_GREEN, width=2)
    cx = x0 + int(float(np.clip(action01, 0, 1)) * (w - 1))
    draw.line([cx, y0, cx, y0 + h - 1], fill=COLOR_YELLOW, width=2)
    xs = np.arange(0.0, 1.0, 0.001)
    ys = beta_pdf(xs, a, b)
    for x, y in zip(xs, ys):
        px = x0 + int(x * w)
        py = y0 + (h - 1) - min(h - 1, int(y / Y_MAX * (h - 1)))
        draw.point((px, py), fill=COLOR_YELLOW)
    draw.text((x0, y0 + 1), label, fill=COLOR_WHITE)


def visualize_model(
    bev: np.ndarray,
    measurements: np.ndarray,
    value_measurements: np.ndarray,
    alpha: np.ndarray,
    beta: np.ndarray,
    action_scaled: np.ndarray,
    value: float,
    upscale: int = UPSCALE,
) -> np.ndarray:
    """Compose the debug frame; returns uint8 RGB [H*upscale, 2*W*upscale, 3].

    `action_scaled` is the action mapped to [0,1] (the reference plots
    scale_action(actions), carla_model.h:343,374).
    """
    from PIL import Image, ImageDraw

    bev = np.asarray(bev)
    h, w = bev.shape[:2]
    plot_h = h // 3                      # carla_model.h:373
    meas_h = h - 2 * plot_h

    panel = Image.new("RGB", (w, h), (0, 0, 0))
    draw = ImageDraw.Draw(panel)
    # measurement text, two columns (carla_model.h:398-411)
    m = np.asarray(measurements).ravel()
    vm = np.asarray(value_measurements).ravel()
    col_x, row_y, row_dy = (0, w // 2), 1, 11
    for i, v in enumerate(m[:10]):
        x = col_x[i % 2]
        y = row_y + (i // 2) * row_dy
        if y + 2 * row_dy > meas_h:  # reserve the bottom row for the value line
            break
        draw.text((x, y), f"m{i}: {float(v):.2f}", fill=COLOR_WHITE)
    draw.text((0, max(0, meas_h - row_dy)), f"V: {float(value):.2f}  vm0: {float(vm[0]):.2f}",
              fill=COLOR_WHITE)
    labels = ("steering", "acceleration")   # carla_model.h:371
    a = np.asarray(alpha).ravel()
    b = np.asarray(beta).ravel()
    act = np.asarray(action_scaled).ravel()
    for i in range(min(2, a.shape[0])):
        _action_plot(draw, 0, meas_h + i * plot_h, w, plot_h,
                     float(a[i]), float(b[i]), float(act[i]), labels[i])

    left = Image.fromarray(colorize_bev(bev))
    out = Image.new("RGB", (2 * w, h))
    out.paste(left, (0, 0))
    out.paste(panel, (w, 0))
    out = out.resize((2 * w * upscale, h * upscale), Image.NEAREST)
    return np.asarray(out, np.uint8)
