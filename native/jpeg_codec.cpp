// Baseline JPEG (JFIF) encoder — native twin of melogan_tpu/imaging/jpeg.py.
//
// Same algorithm and tables (ITU-T T.81 baseline sequential, 4:4:4, Annex K
// quantization/Huffman, libjpeg quality scaling); the Python module is the
// reference implementation and tests cross-check the two. This path exists
// for the MJPEG stream's frame rate: the vectorized-numpy encoder costs
// ~170 ms per 320x240 frame (Python entropy coder), this one ~2 ms.
//
// C ABI:
//   long melo_jpeg_encode(const uint8_t* rgb, int h, int w, int quality,
//                         uint8_t* out, long cap);
// returns bytes written, or -1 when cap is too small / args invalid.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

const int Q_LUMA[64] = {
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99};
const int Q_CHROMA[64] = {
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99};

const int DC_LUMA_BITS[17] = {0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0};
const int DC_LUMA_VALS[12] = {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11};
const int DC_CHROMA_BITS[17] = {0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0};
const int DC_CHROMA_VALS[12] = {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11};

const int AC_LUMA_BITS[17] = {0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D};
const int AC_LUMA_VALS[162] = {
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA};
const int AC_CHROMA_BITS[17] = {0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77};
const int AC_CHROMA_VALS[162] = {
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA};

const int ZIGZAG[64] = {
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

struct Huff {
    uint16_t code[256];
    uint8_t len[256];
};

void build_huff(const int bits[17], const int* vals, int nvals, Huff& h) {
    std::memset(h.len, 0, sizeof(h.len));
    int code = 0, idx = 0;
    for (int length = 1; length <= 16; ++length) {
        for (int i = 0; i < bits[length]; ++i) {
            h.code[vals[idx]] = (uint16_t)code;
            h.len[vals[idx]] = (uint8_t)length;
            ++code;
            ++idx;
        }
        code <<= 1;
    }
    (void)nvals;
}

struct BitWriter {
    std::vector<uint8_t>& buf;
    uint64_t acc = 0;
    int nbits = 0;
    explicit BitWriter(std::vector<uint8_t>& b) : buf(b) {}
    void write(uint32_t code, int length) {
        acc = (acc << length) | (code & ((1ull << length) - 1));
        nbits += length;
        while (nbits >= 8) {
            nbits -= 8;
            uint8_t byte = (uint8_t)((acc >> nbits) & 0xFF);
            buf.push_back(byte);
            if (byte == 0xFF) buf.push_back(0x00);
        }
    }
    void flush() {
        if (nbits) {
            int pad = 8 - nbits;
            write((1u << pad) - 1, pad);
        }
    }
};

inline int bit_size(int v) {
    if (v < 0) v = -v;
    int n = 0;
    while (v) {
        ++n;
        v >>= 1;
    }
    return n;
}

// orthonormal DCT-II matrix
double DCTM[8][8];
bool dct_init = false;
void init_dct() {
    if (dct_init) return;
    for (int k = 0; k < 8; ++k)
        for (int n = 0; n < 8; ++n)
            DCTM[k][n] = std::cos((2 * n + 1) * k * M_PI / 16.0) *
                         (k == 0 ? std::sqrt(1.0 / 8.0) : std::sqrt(2.0 / 8.0));
    dct_init = true;
}

void push_marker(std::vector<uint8_t>& out, uint8_t tag,
                 const std::vector<uint8_t>& payload) {
    out.push_back(0xFF);
    out.push_back(tag);
    uint16_t n = (uint16_t)(payload.size() + 2);
    out.push_back((uint8_t)(n >> 8));
    out.push_back((uint8_t)(n & 0xFF));
    out.insert(out.end(), payload.begin(), payload.end());
}

std::vector<uint8_t> dht_payload(int tc_th, const int bits[17], const int* vals) {
    std::vector<uint8_t> p;
    p.push_back((uint8_t)tc_th);
    int total = 0;
    for (int i = 1; i <= 16; ++i) {
        p.push_back((uint8_t)bits[i]);
        total += bits[i];
    }
    for (int i = 0; i < total; ++i) p.push_back((uint8_t)vals[i]);
    return p;
}

}  // namespace

extern "C" long melo_jpeg_encode(const uint8_t* rgb, int h, int w, int quality,
                                 uint8_t* out, long cap) {
    if (!rgb || !out || h <= 0 || w <= 0 || h > 65500 || w > 65500) return -1;
    init_dct();

    int q = quality < 1 ? 1 : (quality > 100 ? 100 : quality);
    double scale = q < 50 ? 5000.0 / q : 200.0 - 2.0 * q;
    double qt[2][64];
    for (int t = 0; t < 2; ++t) {
        const int* base = t == 0 ? Q_LUMA : Q_CHROMA;
        for (int i = 0; i < 64; ++i) {
            double v = std::floor((base[i] * scale + 50.0) / 100.0);
            qt[t][i] = v < 1 ? 1 : (v > 255 ? 255 : v);
        }
    }

    Huff hdc[2], hac[2];
    build_huff(DC_LUMA_BITS, DC_LUMA_VALS, 12, hdc[0]);
    build_huff(DC_CHROMA_BITS, DC_CHROMA_VALS, 12, hdc[1]);
    build_huff(AC_LUMA_BITS, AC_LUMA_VALS, 162, hac[0]);
    build_huff(AC_CHROMA_BITS, AC_CHROMA_VALS, 162, hac[1]);

    std::vector<uint8_t> o;
    o.reserve((size_t)h * w / 2 + 1024);
    o.push_back(0xFF);
    o.push_back(0xD8);  // SOI
    push_marker(o, 0xE0, {'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0});
    for (int t = 0; t < 2; ++t) {
        std::vector<uint8_t> p;
        p.push_back((uint8_t)t);
        for (int i = 0; i < 64; ++i) p.push_back((uint8_t)qt[t][ZIGZAG[i]]);
        push_marker(o, 0xDB, p);
    }
    {
        std::vector<uint8_t> p = {8,
                                  (uint8_t)(h >> 8), (uint8_t)(h & 0xFF),
                                  (uint8_t)(w >> 8), (uint8_t)(w & 0xFF),
                                  3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1};
        push_marker(o, 0xC0, p);
    }
    push_marker(o, 0xC4, dht_payload(0x00, DC_LUMA_BITS, DC_LUMA_VALS));
    push_marker(o, 0xC4, dht_payload(0x10, AC_LUMA_BITS, AC_LUMA_VALS));
    push_marker(o, 0xC4, dht_payload(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS));
    push_marker(o, 0xC4, dht_payload(0x11, AC_CHROMA_BITS, AC_CHROMA_VALS));
    push_marker(o, 0xDA, {3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0});

    int hb = (h + 7) / 8, wb = (w + 7) / 8;
    BitWriter bw(o);
    int prev_dc[3] = {0, 0, 0};
    double block[8][8], t1[8][8], coef[64];

    for (int by = 0; by < hb; ++by) {
        for (int bx = 0; bx < wb; ++bx) {
            for (int ci = 0; ci < 3; ++ci) {
                // gather 8x8, edge-replicated, YCbCr, level-shifted
                for (int y = 0; y < 8; ++y) {
                    int sy = by * 8 + y;
                    if (sy >= h) sy = h - 1;
                    for (int x = 0; x < 8; ++x) {
                        int sx = bx * 8 + x;
                        if (sx >= w) sx = w - 1;
                        const uint8_t* px = rgb + ((size_t)sy * w + sx) * 3;
                        double r = px[0], g = px[1], b = px[2];
                        double v;
                        if (ci == 0)
                            v = 0.299 * r + 0.587 * g + 0.114 * b;
                        else if (ci == 1)
                            v = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0;
                        else
                            v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0;
                        block[y][x] = v - 128.0;
                    }
                }
                // DCT: t1 = C·block, coef = t1·C^T
                for (int i = 0; i < 8; ++i)
                    for (int j = 0; j < 8; ++j) {
                        double s = 0;
                        for (int k = 0; k < 8; ++k) s += DCTM[i][k] * block[k][j];
                        t1[i][j] = s;
                    }
                const double* qtab = qt[ci == 0 ? 0 : 1];
                double full[64];
                for (int i = 0; i < 8; ++i)
                    for (int l = 0; l < 8; ++l) {
                        double s = 0;
                        for (int k = 0; k < 8; ++k) s += t1[i][k] * DCTM[l][k];
                        full[i * 8 + l] = std::nearbyint(s / qtab[i * 8 + l]);
                    }
                for (int i = 0; i < 64; ++i) coef[i] = full[ZIGZAG[i]];

                int tid = ci == 0 ? 0 : 1;
                int dc = (int)coef[0];
                int diff = dc - prev_dc[ci];
                prev_dc[ci] = dc;
                int size = bit_size(diff);
                bw.write(hdc[tid].code[size], hdc[tid].len[size]);
                if (size) {
                    int amp = diff >= 0 ? diff : diff + (1 << size) - 1;
                    bw.write((uint32_t)amp, size);
                }
                int run = 0;
                int last_nz = 0;
                for (int i = 1; i < 64; ++i)
                    if (coef[i] != 0) last_nz = i;
                for (int i = 1; i <= last_nz; ++i) {
                    int v = (int)coef[i];
                    if (v == 0) {
                        ++run;
                        continue;
                    }
                    while (run >= 16) {
                        bw.write(hac[tid].code[0xF0], hac[tid].len[0xF0]);
                        run -= 16;
                    }
                    int s = bit_size(v);
                    int sym = (run << 4) | s;
                    bw.write(hac[tid].code[sym], hac[tid].len[sym]);
                    int amp = v >= 0 ? v : v + (1 << s) - 1;
                    bw.write((uint32_t)amp, s);
                    run = 0;
                }
                if (last_nz < 63)
                    bw.write(hac[tid].code[0x00], hac[tid].len[0x00]);  // EOB
            }
        }
    }
    bw.flush();
    o.push_back(0xFF);
    o.push_back(0xD9);  // EOI

    if ((long)o.size() > cap) return -1;
    std::memcpy(out, o.data(), o.size());
    return (long)o.size();
}
