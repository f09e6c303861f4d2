// geomlib: native host-side point-cloud geometry kernels.
//
// The reference's host data path (datasets/points_utils.py) does repeated
// numpy passes over 100k-point clouds per sample: translate, rotate, AABB
// mask, compact. These fused single-pass kernels are the native equivalent
// of that layer, exposed through ctypes (open3dsot_tpu/native/__init__.py)
// and used by the samplers / eval input builders; numpy remains the
// semantic reference and the fallback.
//
// All comparisons are strict (<, >) in double precision to match the numpy
// reference exactly (points_utils.py:155-166).

#include <cstdint>
#include <cstring>
#include <cmath>

extern "C" {

// Fused canonicalize + AABB crop.
//   points: (n, 3) float32, row-major (x, y, z)
//   rot:    (9,) double, row-major 3x3 world->local rotation (R^T of box)
//   trans:  (3,) double, box center (subtracted before rotation)
//   half:   (3,) double, crop half-extents in the local frame (+offset baked in)
//   out:    (n, 3) float32 buffer for the kept canonicalized points
// Returns the number of kept points.
int64_t crop_canonical(const float* points, int64_t n,
                       const double* rot, const double* trans,
                       const double* half, float* out) {
    int64_t kept = 0;
    const double r00 = rot[0], r01 = rot[1], r02 = rot[2];
    const double r10 = rot[3], r11 = rot[4], r12 = rot[5];
    const double r20 = rot[6], r21 = rot[7], r22 = rot[8];
    const double tx = trans[0], ty = trans[1], tz = trans[2];
    const double hx = half[0], hy = half[1], hz = half[2];
    for (int64_t i = 0; i < n; ++i) {
        const double px = (double)points[3 * i] - tx;
        const double py = (double)points[3 * i + 1] - ty;
        const double pz = (double)points[3 * i + 2] - tz;
        const double lx = r00 * px + r01 * py + r02 * pz;
        const double ly = r10 * px + r11 * py + r12 * pz;
        const double lz = r20 * px + r21 * py + r22 * pz;
        if (lx < hx && lx > -hx && ly < hy && ly > -hy && lz < hz && lz > -hz) {
            out[3 * kept] = (float)lx;
            out[3 * kept + 1] = (float)ly;
            out[3 * kept + 2] = (float)lz;
            ++kept;
        }
    }
    return kept;
}

// Plain AABB mask (world frame, strict bounds): writes 0/1 bytes.
int64_t aabb_mask(const float* points, int64_t n,
                  const double* mini, const double* maxi, uint8_t* mask) {
    int64_t kept = 0;
    for (int64_t i = 0; i < n; ++i) {
        const double x = points[3 * i], y = points[3 * i + 1], z = points[3 * i + 2];
        const uint8_t in =
            (x < maxi[0] && x > mini[0] && y < maxi[1] && y > mini[1] &&
             z < maxi[2] && z > mini[2])
                ? 1
                : 0;
        mask[i] = in;
        kept += in;
    }
    return kept;
}

// Inclusive oriented in-box test (nuScenes points_in_box semantics):
// local = R^T (p - c); inside iff |local| <= half.
void points_in_box(const float* points, int64_t n,
                   const double* rot, const double* center,
                   const double* half, uint8_t* mask) {
    const double r00 = rot[0], r01 = rot[1], r02 = rot[2];
    const double r10 = rot[3], r11 = rot[4], r12 = rot[5];
    const double r20 = rot[6], r21 = rot[7], r22 = rot[8];
    for (int64_t i = 0; i < n; ++i) {
        const double px = (double)points[3 * i] - center[0];
        const double py = (double)points[3 * i + 1] - center[1];
        const double pz = (double)points[3 * i + 2] - center[2];
        const double lx = r00 * px + r01 * py + r02 * pz;
        const double ly = r10 * px + r11 * py + r12 * pz;
        const double lz = r20 * px + r21 * py + r22 * pz;
        if (std::fabs(lx) <= half[0] && std::fabs(ly) <= half[1] &&
            std::fabs(lz) <= half[2]) {
            mask[i] = 1;
        } else {
            mask[i] = 0;
        }
    }
}

// BoxCloud: distances of (n, 3) points to 9 keypoints -> (n, 9) float32.
void box_cloud(const float* points, int64_t n, const double* keypoints9x3,
               float* out) {
    for (int64_t i = 0; i < n; ++i) {
        const double px = points[3 * i], py = points[3 * i + 1], pz = points[3 * i + 2];
        for (int k = 0; k < 9; ++k) {
            const double dx = px - keypoints9x3[3 * k];
            const double dy = py - keypoints9x3[3 * k + 1];
            const double dz = pz - keypoints9x3[3 * k + 2];
            out[9 * i + k] = (float)std::sqrt(dx * dx + dy * dy + dz * dz);
        }
    }
}

// Gather rows: out[i] = points[idx[i]] for (n_out) int64 indices over (n, c).
void gather_rows(const float* points, int64_t n, int64_t c,
                 const int64_t* idx, int64_t n_out, float* out) {
    for (int64_t i = 0; i < n_out; ++i) {
        std::memcpy(out + c * i, points + c * idx[i], sizeof(float) * (size_t)c);
    }
}

}  // extern "C"
