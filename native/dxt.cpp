// Native host DXT1/DXT5 block decode.
//
// TPU-host equivalent of the reference's squish decode path
// (framework/NetKinectArray.cpp:620) and threaded fastdxt usage
// (framework/io/DXTCompressor.h:16-48): recorded .stream files and live ZMQ
// frames carry DXT-compressed color planes that must be expanded to RGB888 on
// the host before device_put. Row-blocks are decoded across std::threads.
//
// Palette arithmetic intentionally matches the numpy oracle in
// rgbd_recon_tpu/io/dxt.py (truncating integer /3 and /2) so the two paths
// are bit-identical.
#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline void expand565(uint16_t c, int* rgb) {
  int r = (c >> 11) & 0x1F, g = (c >> 5) & 0x3F, b = c & 0x1F;
  rgb[0] = (r << 3) | (r >> 2);
  rgb[1] = (g << 2) | (g >> 4);
  rgb[2] = (b << 3) | (b >> 2);
}

void decode_rows(const uint8_t* in, uint8_t* out, int width, int y0, int y1,
                 int block_bytes, bool force4) {
  const int bw = width / 4;
  for (int by = y0; by < y1; ++by) {
    for (int bx = 0; bx < bw; ++bx) {
      // DXT5 blocks: skip the 8-byte alpha block (RGB output, like the oracle)
      const uint8_t* b = in + static_cast<size_t>(by * bw + bx) * block_bytes +
                         (block_bytes == 16 ? 8 : 0);
      const uint16_t c0 = static_cast<uint16_t>(b[0] | (b[1] << 8));
      const uint16_t c1 = static_cast<uint16_t>(b[2] | (b[3] << 8));
      const uint32_t bits = static_cast<uint32_t>(b[4]) |
                            (static_cast<uint32_t>(b[5]) << 8) |
                            (static_cast<uint32_t>(b[6]) << 16) |
                            (static_cast<uint32_t>(b[7]) << 24);
      int p[4][3];
      expand565(c0, p[0]);
      expand565(c1, p[1]);
      if (c0 > c1 || force4) {
        for (int k = 0; k < 3; ++k) {
          p[2][k] = (2 * p[0][k] + p[1][k]) / 3;
          p[3][k] = (p[0][k] + 2 * p[1][k]) / 3;
        }
      } else {
        for (int k = 0; k < 3; ++k) {
          p[2][k] = (p[0][k] + p[1][k]) / 2;
          p[3][k] = 0;
        }
      }
      for (int t = 0; t < 16; ++t) {
        const int idx = (bits >> (2 * t)) & 0x3;
        uint8_t* o = out + (static_cast<size_t>(by * 4 + t / 4) * width +
                            bx * 4 + (t % 4)) * 3;
        o[0] = static_cast<uint8_t>(p[idx][0]);
        o[1] = static_cast<uint8_t>(p[idx][1]);
        o[2] = static_cast<uint8_t>(p[idx][2]);
      }
    }
  }
}

void decode(const uint8_t* in, uint8_t* out, int width, int height,
            int block_bytes, bool force4, int num_threads) {
  const int bh = height / 4;
  int n = num_threads > 0 ? num_threads
                          : static_cast<int>(std::thread::hardware_concurrency());
  n = std::max(1, std::min(n, bh));
  if (n == 1) {
    decode_rows(in, out, width, 0, bh, block_bytes, force4);
    return;
  }
  std::vector<std::thread> ts;
  const int chunk = (bh + n - 1) / n;
  for (int i = 0; i < n; ++i) {
    const int y0 = i * chunk, y1 = std::min(bh, y0 + chunk);
    if (y0 >= y1) break;
    ts.emplace_back(decode_rows, in, out, width, y0, y1, block_bytes, force4);
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

void rgbd_decode_dxt1(const uint8_t* in, uint8_t* out, int width, int height,
                      int num_threads) {
  decode(in, out, width, height, 8, false, num_threads);
}

void rgbd_decode_dxt5(const uint8_t* in, uint8_t* out, int width, int height,
                      int num_threads) {
  decode(in, out, width, height, 16, true, num_threads);
}

}  // extern "C"
