// ASan/UBSan robustness harness for the TIFF/LZW decoder (dev tool):
//   g++ -O1 -g -fsanitize=address,undefined -o fuzz_decode fuzz_decode.cc -lpthread -lz
//   ./fuzz_decode [iterations]
// Feeds (a) random bytes, (b) structurally valid TIFFs with random LZW
// strip payloads — including multi-strip layouts and adversarial
// RowsPerStrip values (0, near-2^32) probing the strip-geometry
// arithmetic — and (c) bit-flipped real encodings through decode_one.
// Every call must return cleanly (ok or error) — no OOB, no UB, no hang.
#include "tiff_lzw.cpp"

#include <algorithm>
#include <cstdio>
#include <map>
#include <random>
#include <string>

static std::vector<uint8_t> make_tiff(uint32_t h, uint32_t w, uint16_t comp,
                                      uint16_t pred,
                                      const std::vector<std::vector<uint8_t>>& strips,
                                      uint32_t rps, uint16_t bits = 16,
                                      uint32_t tw = 0, uint32_t th = 0) {
    std::vector<uint8_t> b;
    auto p16 = [&](uint16_t v) { b.push_back(v & 0xff); b.push_back(v >> 8); };
    auto p32 = [&](uint32_t v) { for (int i = 0; i < 4; ++i) b.push_back((v >> (8*i)) & 0xff); };
    b.push_back('I'); b.push_back('I'); p16(42);
    p32(0);  // IFD offset, patched below
    uint32_t n = (uint32_t)strips.size();
    std::vector<uint32_t> offs, cnts;
    for (auto& s : strips) {
        offs.push_back((uint32_t)b.size());
        cnts.push_back((uint32_t)s.size());
        b.insert(b.end(), s.begin(), s.end());
    }
    uint32_t arr_off = (uint32_t)b.size();
    if (n > 1) {  // out-of-line offset/count arrays
        for (uint32_t v : offs) p32(v);
        for (uint32_t v : cnts) p32(v);
    }
    uint32_t ifd_off = (uint32_t)b.size();
    struct E { uint16_t tag, typ; uint32_t cnt, val; };
    bool tiled = tw || th;
    uint16_t off_tag = tiled ? 324 : 273, cnt_tag = tiled ? 325 : 279;
    std::vector<E> es = {
        {256,3,1,w},{257,3,1,h},{258,3,1,bits},{259,3,1,comp},{262,3,1,1},
        {off_tag,4,n, n == 1 ? offs[0] : arr_off},{277,3,1,1},
        {278,4,1,rps},
        {cnt_tag,4,n, n == 1 ? cnts[0] : arr_off + 4 * n},{317,3,1,pred}};
    if (tiled) {
        es.push_back({322,3,1,tw});
        es.push_back({323,3,1,th});
        std::sort(es.begin(), es.end(),
                  [](const E& a, const E& bb) { return a.tag < bb.tag; });
    }
    p16((uint16_t)es.size());
    for (auto& e : es) { p16(e.tag); p16(e.typ); p32(e.cnt); p32(e.val); }
    p32(0);
    for (int i = 0; i < 4; ++i) b[4 + i] = (ifd_off >> (8 * i)) & 0xff;
    return b;
}

// Minimal TIFF-variant LZW encoder (MSB-first bit packing, early change):
// reference-quality is irrelevant here, only valid streams matter — used to
// craft streams that decode to MORE bytes than the declared image so the
// decoder's clip-at-dst_len path is exercised mid-long-string.
static std::vector<uint8_t> lzw_encode(const std::vector<uint8_t>& data) {
    std::vector<uint8_t> out;
    uint64_t acc = 0;
    int nbits = 0;
    int code_bits = 9;
    auto put = [&](int code) {
        acc = (acc << code_bits) | (uint64_t)code;
        nbits += code_bits;
        while (nbits >= 8) {
            out.push_back((uint8_t)(acc >> (nbits - 8)));
            nbits -= 8;
        }
    };
    std::map<std::string, int> table;
    for (int i = 0; i < 256; ++i) table[std::string(1, (char)i)] = i;
    int next_code = 258;
    put(256);  // Clear
    std::string w;
    for (uint8_t c : data) {
        std::string wc = w + (char)c;
        if (table.count(wc)) {
            w = wc;
            continue;
        }
        put(table[w]);
        table[wc] = next_code++;
        // TIFF early change, seen from the ENCODER: the decoder's table
        // runs one entry behind and bumps width when ITS next_code hits
        // (1<<bits)-1 — one code later in the stream — so the encoder
        // bumps at (1<<bits)
        if (next_code == (1 << code_bits) && code_bits < 12) ++code_bits;
        if (next_code >= 4094) {  // stay clear of table-full handling
            put(256);
            table.clear();
            for (int i = 0; i < 256; ++i) table[std::string(1, (char)i)] = i;
            next_code = 258;
            code_bits = 9;
        }
        w = std::string(1, (char)c);
    }
    if (!w.empty()) put(table[w]);
    put(257);  // EoI
    if (nbits) out.push_back((uint8_t)(acc << (8 - nbits)));
    return out;
}

// Deterministic crafted cases: a zero-run encodes to strings of growing
// length, so sweeping the declared image size over the run crosses a LONG
// (>48-byte) string at every offset — the stream then decodes to more
// bytes than dst and must CLIP there without writing past dst (the bulk
// emit fast path skips its dst-bound compare, so a missed stop after a
// clipped long emit would be a 16-byte heap overflow — ASan's job here).
// Encoder/decoder roundtrip across width changes (9->10->11 bits and a
// mid-stream Clear): validates the harness encoder itself so the overlong
// sweep's "clipped prefix must be the data" assertion means something.
static int roundtrip_case(int fd, const char* path) {
    std::mt19937 g(7);
    std::vector<uint8_t> data(20000);
    for (size_t i = 0; i < data.size(); ++i)
        data[i] = (uint8_t)(g() % 7 ? (g() % 4) : (uint8_t)g());  // mixed
    auto enc = lzw_encode(data);
    auto tif = make_tiff(1, (uint32_t)data.size(), 5, 1, {enc}, 1, 8);
    if (::ftruncate(fd, 0) != 0 || ::lseek(fd, 0, SEEK_SET) < 0 ||
        ::write(fd, tif.data(), tif.size()) != (ssize_t)tif.size())
        return -1;
    std::vector<uint8_t> out(data.size(), 0xAB);
    std::string err;
    if (decode_one(path, 0, out.data(), (long long)out.size(), 1, &err) != 0)
        return -2;
    return out == data ? 0 : -3;
}

static int overlong_cases(int fd, const char* path) {
    // data = Z zeros then 64 sevens: the encoder emits growing zero
    // strings, a FINAL zero chunk whose length r sweeps 0..~50 as Z does,
    // then a LITERAL '7'.  Sweeping (Z, dst_len) puts the clip point at
    // every offset inside every string, in both pair phases, with both a
    // long-string and a 1-byte-literal follow-up code — including the
    // hazardous alignment: clip lands >=48 bytes past the pair-start di
    // inside a long string whose NEXT code is a short one (the unchecked
    // bulk fast emit).  8-bit samples give byte-granular dst_len.
    std::vector<uint8_t> out;
    std::string err;
    int accepted = 0;
    for (uint32_t Z = 1225; Z <= 1330; Z += 3) {
        std::vector<uint8_t> data(Z + 64, 0);
        for (size_t i = Z; i < data.size(); ++i) data[i] = 7;
        auto enc = lzw_encode(data);
        for (uint32_t w = Z - 80; w <= Z + 2; ++w) {  // dst_len = w (u8)
            auto tif = make_tiff(1, w, 5, 1, {enc}, 1, 8);
            if (::ftruncate(fd, 0) != 0 || ::lseek(fd, 0, SEEK_SET) < 0 ||
                ::write(fd, tif.data(), tif.size()) != (ssize_t)tif.size())
                return -1;
            out.assign((size_t)w + 64, 0xAB);
            int rc = decode_one(path, 0, out.data(), (long long)w, 1, &err);
            if (rc == 0) {
                ++accepted;
                for (size_t i = 0; i < (size_t)w; ++i)
                    if (out[i] != data[i]) return -2;  // clipped prefix exact
            }
            for (size_t i = (size_t)w; i < out.size(); ++i)
                if (out[i] != 0xAB) return -3;  // bytes past dst_len untouched
        }
    }
    return accepted;
}

// Valid tiled page decoded with 1..4 threads: all results byte-identical
// (disjoint output regions; per-thread scratch).  Exercises the
// concurrent tiled path even on a 1-core box.
static int tiled_thread_case(int fd, const char* path) {
    std::mt19937 g(11);
    const uint32_t h = 90, w = 130, tw = 48, th = 32;
    std::vector<uint8_t> img((size_t)h * w * 2);
    for (auto& c : img) c = (uint8_t)g();
    std::vector<std::vector<uint8_t>> tiles;
    for (uint32_t y0 = 0; y0 < h; y0 += th)
        for (uint32_t x0 = 0; x0 < w; x0 += tw) {
            std::vector<uint8_t> t((size_t)tw * th * 2, 0);
            for (uint32_t rr = 0; rr < th && y0 + rr < h; ++rr) {
                uint32_t vw = (x0 + tw <= w) ? tw : w - x0;
                std::memcpy(t.data() + (size_t)rr * tw * 2,
                            img.data() + ((size_t)(y0 + rr) * w + x0) * 2,
                            (size_t)vw * 2);
            }
            tiles.push_back(lzw_encode(t));
        }
    auto tif = make_tiff(h, w, 5, 1, tiles, 1, 16, tw, th);
    if (::ftruncate(fd, 0) != 0 || ::lseek(fd, 0, SEEK_SET) < 0 ||
        ::write(fd, tif.data(), tif.size()) != (ssize_t)tif.size())
        return -1;
    std::string err;
    std::vector<uint8_t> ref(img.size(), 0);
    if (decode_one(path, 0, ref.data(), (long long)ref.size(), 1, &err) != 0)
        return -2;
    if (ref != img) return -3;
    for (unsigned nt = 2; nt <= 4; ++nt) {
        std::vector<uint8_t> got(img.size(), 0xCD);
        if (decode_one(path, 0, got.data(), (long long)got.size(), nt,
                       &err) != 0)
            return -4;
        if (got != img) return -5;
    }
    return 0;
}

int main(int argc, char** argv) {
    int iters = argc > 1 ? std::atoi(argv[1]) : 400;
    std::mt19937 g(123);
    std::vector<uint8_t> out;
    std::string err;
    int ok = 0, fail = 0;
    char path[] = "/tmp/fuzz_decode_XXXXXX.tif";
    int fd = mkstemps(path, 4);  // own file: concurrent runs don't clobber
    if (fd < 0) { std::perror("mkstemps"); return 2; }
    int rt = roundtrip_case(fd, path);
    if (rt != 0) {
        std::printf("encoder/decoder roundtrip FAILED (%d)\n", rt);
        return 1;
    }
    int tt = tiled_thread_case(fd, path);
    if (tt != 0) {
        std::printf("tiled multithread case FAILED (%d)\n", tt);
        return 1;
    }
    int oc = overlong_cases(fd, path);
    if (oc < 0) {
        std::printf("overlong crafted cases FAILED (%d)\n", oc);
        return 1;
    }
    for (int it = 0; it < iters; ++it) {
        uint32_t h = 1 + g() % 64, w = 1 + g() % 96;
        uint32_t n_strips = 1 + g() % 4;
        std::vector<std::vector<uint8_t>> strips(n_strips);
        for (auto& strip : strips) {
            strip.resize(g() % 2048);
            for (auto& c : strip) c = (uint8_t)g();
        }
        // RowsPerStrip sweep: sane, fractional, zero, and the near-2^32
        // values whose 32-bit row0/row0+rows arithmetic once wrapped
        // past the height clamp (decode_page strip geometry)
        uint32_t rps;
        switch (g() % 5) {
            case 0: rps = h; break;
            case 1: rps = 1 + g() % h; break;
            case 2: rps = 0; break;
            case 3: rps = 0x80000000u | (uint32_t)g(); break;
            default: rps = 0xFFFFFF00u + (g() % 512); break;
        }
        // none / LZW / Adobe deflate / old deflate / PackBits
        static const uint16_t kComps[] = {1, 5, 5, 8, 32946, 32773};
        uint16_t comp = kComps[it % 6];
        uint16_t pred = (it % 2) ? 2 : 1;
        // every 5th case uses a tiled layout (random tile geometry, often
        // mismatching the payload count/size: the tile-grid bounds and
        // missing-tile checks must hold)
        uint32_t tw = 0, th = 0;
        if (it % 5 == 2) {
            tw = 1 + g() % 96;
            th = 1 + g() % 64;
        }
        auto tif = (it % 7 == 0)
                       ? std::vector<uint8_t>(strips[0])    // pure garbage file
                       : make_tiff(h, w, comp, pred, strips, rps, 16, tw, th);
        if (it % 11 == 3 && tif.size() > 8) {
            // stamp a BigTIFF header over a classic body: the 64-bit IFD
            // walk lands on garbage and must fail cleanly
            tif[2] = 43; tif[3] = 0; tif[4] = 8; tif[5] = 0; tif[6] = 0;
            tif[7] = 0;
        }
        if (::ftruncate(fd, 0) != 0 || ::lseek(fd, 0, SEEK_SET) < 0 ||
            ::write(fd, tif.data(), tif.size()) != (ssize_t)tif.size()) {
            std::perror("write case");
            return 2;
        }
        out.assign((size_t)h * w * 2, 0xAB);
        int rc = decode_one(path, 0, out.data(),
                            (long long)out.size(), 1, &err);
        (rc == 0 ? ok : fail)++;
    }
    ::close(fd);
    ::unlink(path);
    std::printf("fuzz: %d iterations, %d decoded, %d rejected — no crashes\n",
                iters, ok, fail);
    return 0;
}
