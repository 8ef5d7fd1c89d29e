"""Bitmap font atlas for the UI pass.

The reference uploads Dear ImGui's font atlas as an R8_UNORM texture and the
imgui fragment shader reads only `.r` as alpha (imgui_support.rs:52-99,
imgui.frag:34-39 tex_kind 1). Here the glyph atlas is rasterized once from
PIL's built-in bitmap font into an RGBA8 texture whose R channel is the glyph
coverage, registered as a normal texture slot (TextureKind.LINEAR_COLOR — no
sRGB decode on fonts).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from renderer_tpu.materials.registry import MaterialRegistry, Texture, TextureKind

ASCII_FIRST = 32
ASCII_LAST = 126


@dataclass
class Glyph:
    u0: float
    v0: float
    u1: float
    v1: float
    width: int
    height: int
    advance: int


class Font:
    """One rasterized glyph atlas + per-character uv table."""

    def __init__(self) -> None:
        from PIL import Image, ImageDraw, ImageFont

        pil_font = ImageFont.load_default()
        chars = [chr(c) for c in range(ASCII_FIRST, ASCII_LAST + 1)]

        # measure
        probe = Image.new("L", (64, 64))
        draw = ImageDraw.Draw(probe)
        boxes = {}
        max_h = 1
        for ch in chars:
            x0, y0, x1, y1 = draw.textbbox((0, 0), ch, font=pil_font)
            w = max(int(x1), 1)
            h = max(int(y1), 1)
            boxes[ch] = (w, h)
            max_h = max(max_h, h)
        self.line_height = max_h + 2

        # rasterize one row per 16 glyphs
        cols = 16
        cell_w = max(w for w, _ in boxes.values()) + 1
        rows = (len(chars) + cols - 1) // cols
        img = Image.new("L", (cols * cell_w, rows * self.line_height), 0)
        draw = ImageDraw.Draw(img)
        self.glyphs: dict[str, Glyph] = {}
        aw, ah = img.size
        for i, ch in enumerate(chars):
            cx = (i % cols) * cell_w
            cy = (i // cols) * self.line_height
            draw.text((cx, cy), ch, fill=255, font=pil_font)
            w, h = boxes[ch]
            self.glyphs[ch] = Glyph(
                u0=cx / aw, v0=cy / ah, u1=(cx + w) / aw,
                v1=(cy + self.line_height - 1) / ah,
                width=w, height=self.line_height - 1, advance=w + 1,
            )

        coverage = np.asarray(img, np.uint8)
        rgba = np.zeros((*coverage.shape, 4), np.uint8)
        rgba[..., 0] = coverage  # alpha lives in R (R8 parity)
        rgba[..., 1] = rgba[..., 2] = coverage
        rgba[..., 3] = coverage
        self._rgba = rgba
        # one Texture PER registry: a Texture carries the slot the registry
        # that registered it assigned, so sharing one object across
        # registries would leak the first registry's slot into the second
        # (register_texture short-circuits on slot >= 0). Weak keys so a
        # dead registry can't alias a recycled id and the cache can't grow
        # unboundedly.
        import weakref

        self._textures: "weakref.WeakKeyDictionary[MaterialRegistry, Texture]" \
            = weakref.WeakKeyDictionary()

    def slot(self, registry: MaterialRegistry) -> int:
        tex = self._textures.get(registry)
        if tex is None:
            tex = Texture([self._rgba], TextureKind.LINEAR_COLOR, "ui-font")
            self._textures[registry] = tex
        return registry.register_texture(tex)

    def text_width(self, text: str) -> int:
        return sum(self.glyphs.get(c, self.glyphs["?"]).advance for c in text)


_font: Font | None = None


def get_font() -> Font:
    global _font
    if _font is None:
        _font = Font()
    return _font
