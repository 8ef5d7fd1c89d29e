// Atlas region blitter (native half of materials/atlas.py).
//
// Startup packs every decoded texture mip into the RGBA8-in-u32 atlas with a
// one-texel REPEAT-wrapped border (the hot loop of the reference's startup
// upload phase, image_loading.rs:83-237 — there the copies are GPU DMAs; here
// they are host memcpys feeding one device upload). Single pass, no numpy
// temporaries.

#include <cstdint>
#include <cstring>

extern "C" {

// src: [h, w, 4] u8 rgba (contiguous). atlas: [atlas_h, atlas_w] u32.
// (x, y): top-left of the region INSIDE the border, so writes span
// [y-1, y+h] x [x-1, x+w].
void atlas_blit_wrap(const uint8_t* src, int w, int h,
                     uint32_t* atlas, int atlas_w, int x, int y) {
  const uint32_t* s = reinterpret_cast<const uint32_t*>(src);
  for (int row = -1; row <= h; row++) {
    int sy = (row + h) % h;          // REPEAT wrap
    const uint32_t* srow = s + size_t(sy) * w;
    uint32_t* drow = atlas + size_t(y + row) * atlas_w + x;
    std::memcpy(drow, srow, size_t(w) * 4);
    drow[-1] = srow[w - 1];          // left border (wrap)
    drow[w] = srow[0];               // right border (wrap)
  }
}

}  // extern "C"
