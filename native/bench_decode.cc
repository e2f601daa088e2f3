// Phase-level microbenchmark for the TIFF/LZW decoder (dev tool, not part
// of the library build):  ./bench_decode <file.tif> [reps]
// Times (a) whole-file decode, (b) the LZW inner loop alone on pre-read
// strips, reporting per-rep medians so shared-box noise is visible.
#include "tiff_lzw.cpp"

#include <algorithm>
#include <chrono>
#include <cstdio>

static double now_s() {
    return std::chrono::duration<double>(
               std::chrono::steady_clock::now().time_since_epoch())
        .count();
}

int main(int argc, char** argv) {
    if (argc < 2) {
        std::fprintf(stderr, "usage: %s file.tif [reps]\n", argv[0]);
        return 2;
    }
    int reps = argc > 2 ? std::atoi(argv[2]) : 15;
    Reader r;
    std::string err;
    if (!load_file(argv[1], &r, &err)) {
        std::fprintf(stderr, "load: %s\n", err.c_str());
        return 1;
    }
    TiffPage pg;
    if (!parse_page(r, 0, &pg, &err)) {
        std::fprintf(stderr, "parse: %s\n", err.c_str());
        return 1;
    }
    size_t row_bytes = (size_t)pg.width * (pg.bits / 8) * pg.samples;
    size_t need = row_bytes * pg.height;
    std::vector<uint8_t> out(need);
    double mpix = pg.width * (double)pg.height / 1e6;

    std::vector<double> t_full, t_lzw;
    for (int rep = 0; rep < reps; ++rep) {
        double t0 = now_s();
        decode_page(r, pg, out.data(), (long long)need, 1, &err);
        t_full.push_back(now_s() - t0);

        t0 = now_s();
        size_t n_strips = pg.strip_offsets.size();
        for (size_t s = 0; s < n_strips; ++s) {
            uint32_t row0 = (uint32_t)(s * pg.rows_per_strip);
            if (row0 >= pg.height) continue;
            uint32_t rows = pg.rows_per_strip;
            if (row0 + rows > pg.height) rows = pg.height - row0;
            lzw_decode(r.ptr + pg.strip_offsets[s],
                       pg.strip_counts[s], out.data() + row_bytes * row0,
                       row_bytes * rows, &err);
        }
        t_lzw.push_back(now_s() - t0);
    }
    std::sort(t_full.begin(), t_full.end());
    std::sort(t_lzw.begin(), t_lzw.end());
    double mf = t_full[t_full.size() / 2], ml = t_lzw[t_lzw.size() / 2];
    std::printf(
        "full: median %.1f best %.1f Mpix/s | lzw-only: median %.1f best "
        "%.1f Mpix/s | predictor+swap share: %.0f%%\n",
        mpix / mf, mpix / t_full[0], mpix / ml, mpix / t_lzw[0],
        100.0 * (mf - ml) / mf);
    return 0;
}
