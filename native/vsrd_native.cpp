// Native data-path kernels for vsrd_tpu's host input pipeline.
//
// The TPU compute path is JAX/Pallas; these C++ kernels accelerate the
// host-side preprocessing that feeds it (the reference does this work in
// Python via pycocotools/cv2): COCO RLE decode/encode (column-major) and
// the SoftRasterizer's polygon distance map (O(H*W*V) inner loop,
// reference geometric_transforms.py:265-288).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Decode run lengths (alternating background/foreground, column-major)
// into a row-major uint8 mask of shape [h, w].
void rle_decode(const int64_t* counts, int64_t num_counts, int64_t height,
                int64_t width, uint8_t* out) {
    const int64_t total = height * width;
    std::memset(out, 0, static_cast<size_t>(total));
    int64_t pos = 0;
    uint8_t value = 0;
    for (int64_t i = 0; i < num_counts && pos < total; ++i) {
        int64_t count = counts[i];
        if (count > total - pos) count = total - pos;
        if (value) {
            // column-major run -> row-major writes
            for (int64_t k = 0; k < count; ++k) {
                const int64_t flat = pos + k;
                const int64_t col = flat / height;
                const int64_t row = flat % height;
                out[row * width + col] = 1;
            }
        }
        pos += count;
        value ^= 1;
    }
}

// Encode a row-major uint8 mask into column-major run lengths.
// Returns the number of counts written (<= max_counts); the first count
// is the number of leading zeros (possibly 0).
int64_t rle_encode(const uint8_t* mask, int64_t height, int64_t width,
                   int64_t* counts, int64_t max_counts) {
    const int64_t total = height * width;
    int64_t num = 0;
    uint8_t current = 0;
    int64_t run = 0;
    for (int64_t flat = 0; flat < total; ++flat) {
        const int64_t col = flat / height;
        const int64_t row = flat % height;
        const uint8_t value = mask[row * width + col] ? 1 : 0;
        if (value == current) {
            ++run;
        } else {
            if (num >= max_counts) return -1;
            counts[num++] = run;
            current = value;
            run = 1;
        }
    }
    if (num >= max_counts) return -1;
    counts[num++] = run;
    return num;
}

// Unsigned distance from every pixel center to the closest polygon edge.
// polygon: [num_vertices, 2] (x, y) float32; out: [height, width] float32.
void polygon_distance_map(const float* polygon, int64_t num_vertices,
                          int64_t height, int64_t width, float* out) {
    for (int64_t y = 0; y < height; ++y) {
        for (int64_t x = 0; x < width; ++x) {
            const float px = static_cast<float>(x);
            const float py = static_cast<float>(y);
            float best = 1e30f;
            for (int64_t v = 0; v < num_vertices; ++v) {
                const float ax = polygon[2 * v];
                const float ay = polygon[2 * v + 1];
                const int64_t nxt = (v + 1 == num_vertices) ? 0 : v + 1;
                const float bx = polygon[2 * nxt];
                const float by = polygon[2 * nxt + 1];
                const float dx = bx - ax;
                const float dy = by - ay;
                const float denom = dx * dx + dy * dy + 1e-6f;
                float t = ((px - ax) * dx + (py - ay) * dy) / denom;
                t = std::min(1.0f, std::max(0.0f, t));
                const float ex = px - (ax + t * dx);
                const float ey = py - (ay + t * dy);
                const float d2 = ex * ex + ey * ey;
                if (d2 < best) best = d2;
            }
            out[y * width + x] = std::sqrt(best);
        }
    }
}

// Point-in-polygon fill (even-odd rule), row-major uint8 out.
void polygon_fill(const float* polygon, int64_t num_vertices, int64_t height,
                  int64_t width, uint8_t* out) {
    std::memset(out, 0, static_cast<size_t>(height * width));
    for (int64_t y = 0; y < height; ++y) {
        const float py = static_cast<float>(y);
        for (int64_t x = 0; x < width; ++x) {
            const float px = static_cast<float>(x);
            bool inside = false;
            for (int64_t v = 0, u = num_vertices - 1; v < num_vertices;
                 u = v++) {
                const float vx = polygon[2 * v];
                const float vy = polygon[2 * v + 1];
                const float ux = polygon[2 * u];
                const float uy = polygon[2 * u + 1];
                if (((vy > py) != (uy > py)) &&
                    (px < (ux - vx) * (py - vy) / (uy - vy + 1e-12f) + vx)) {
                    inside = !inside;
                }
            }
            out[y * width + x] = inside ? 1 : 0;
        }
    }
}

}  // extern "C"
