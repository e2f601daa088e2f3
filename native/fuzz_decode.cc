// ASan/UBSan robustness harness for the TIFF/LZW decoder (dev tool):
//   g++ -O1 -g -fsanitize=address,undefined -o fuzz_decode fuzz_decode.cc -lpthread
//   ./fuzz_decode [iterations]
// Feeds (a) random bytes, (b) structurally valid TIFFs with random LZW
// strip payloads, and (c) bit-flipped real encodings through decode_one.
// Every call must return cleanly (ok or error) — no OOB, no UB, no hang.
#include "tiff_lzw.cpp"

#include <cstdio>
#include <random>

static std::vector<uint8_t> make_tiff(std::mt19937& g, uint32_t h, uint32_t w,
                                      uint16_t comp, uint16_t pred,
                                      const std::vector<uint8_t>& strip) {
    std::vector<uint8_t> b;
    auto p16 = [&](uint16_t v) { b.push_back(v & 0xff); b.push_back(v >> 8); };
    auto p32 = [&](uint32_t v) { for (int i = 0; i < 4; ++i) b.push_back((v >> (8*i)) & 0xff); };
    b.push_back('I'); b.push_back('I'); p16(42);
    uint32_t data_off = 8, ifd_off = data_off + (uint32_t)strip.size();
    p32(ifd_off);
    b.insert(b.end(), strip.begin(), strip.end());
    struct E { uint16_t tag, typ; uint32_t cnt, val; };
    E es[] = {{256,3,1,w},{257,3,1,h},{258,3,1,16},{259,3,1,comp},{262,3,1,1},
              {273,4,1,data_off},{277,3,1,1},{278,4,1,h},
              {279,4,1,(uint32_t)strip.size()},{317,3,1,pred}};
    p16(10);
    for (auto& e : es) { p16(e.tag); p16(e.typ); p32(e.cnt); p32(e.val); }
    p32(0);
    return b;
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
    for (int it = 0; it < iters; ++it) {
        uint32_t h = 1 + g() % 64, w = 1 + g() % 96;
        std::vector<uint8_t> strip(g() % 4096);
        for (auto& c : strip) c = (uint8_t)g();
        uint16_t comp = (it % 3 == 0) ? 1 : 5;  // none / LZW
        uint16_t pred = (it % 2) ? 2 : 1;
        auto tif = (it % 7 == 0)
                       ? std::vector<uint8_t>(strip)        // pure garbage file
                       : make_tiff(g, h, w, comp, pred, strip);
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
