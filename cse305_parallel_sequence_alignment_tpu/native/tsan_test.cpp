// ThreadSanitizer exercise for the threaded host runtime (tsa_walk_batch's
// worker pool and concurrent tsa_render calls). Built and run by
// `make -C native tsan`; any data race aborts with a TSAN report.
//
// The walks are synthetic: an all-zero direction matrix means "T1 came
// from T1" everywhere, i.e. every pair walks the pure diagonal — enough
// to drive every thread through the shared read-only dirs buffer and the
// disjoint output rows.
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {
int64_t tsa_walk(const void*, int64_t, int64_t, int64_t, int64_t, int, int,
                 void*, void*, void*);
int tsa_walk_batch(const uint8_t*, int64_t, int64_t, int64_t,
                   const int64_t*, const int64_t*, const int32_t*, int64_t,
                   int, int, int64_t, int32_t*, int64_t*, int64_t*,
                   int64_t*);
void tsa_render(const void*, const void*, const void*, const void*,
                const void*, int64_t, void*, void*);
}

int main() {
  const int64_t B = 97, m = 300, n = 280;
  const int64_t rows = m + n + 1, cols = n + 1;
  std::vector<uint8_t> dirs(B * rows * cols, 0);  // skew layout, pair axis 0
  std::vector<int64_t> ms(B, m), ns(B, n);
  std::vector<int32_t> t0(B, 1);
  const int64_t cap = m + n + 2;
  std::vector<int32_t> out_t(B * cap);
  std::vector<int64_t> out_i(B * cap), out_j(B * cap), out_len(B);

  // pair r's dirs block: strides in BYTES (pair, diag-row, column)
  for (int rep = 0; rep < 4; rep++) {
    int rc = tsa_walk_batch(dirs.data(), rows * cols, cols, 1, ms.data(),
                            ns.data(), t0.data(), B, /*skew=*/1,
                            /*full=*/rep % 2, cap, out_t.data(),
                            out_i.data(), out_j.data(), out_len.data());
    if (rc != 0) {
      std::fprintf(stderr, "tsa_walk_batch rc=%d\n", rc);
      return 1;
    }
  }
  for (int64_t r = 0; r < B; r++) {
    if (out_len[r] <= 0 || out_len[r] > cap) {
      std::fprintf(stderr, "bad chain length %lld at %lld\n",
                   (long long)out_len[r], (long long)r);
      return 1;
    }
  }

  // concurrent renders over the walked chains (read-only inputs,
  // disjoint outputs) — the pattern models/batch.py drives per pair
  std::vector<uint8_t> a(m, 'A'), b(n, 'A');
  std::vector<std::thread> pool;
  std::vector<std::vector<uint8_t>> ra(B), rb(B);
  for (int64_t r = 0; r < B; r++) {
    ra[r].resize(out_len[r]);
    rb[r].resize(out_len[r]);
  }
  for (int w = 0; w < 8; w++) {
    pool.emplace_back([&, w]() {
      for (int64_t r = w; r < B; r += 8) {
        tsa_render(a.data(), b.data(), out_t.data() + r * cap,
                   out_i.data() + r * cap, out_j.data() + r * cap,
                   out_len[r], ra[r].data(), rb[r].data());
      }
    });
  }
  for (auto& t : pool) t.join();
  std::printf("tsan_test: OK (%lld walks + %lld renders)\n",
              (long long)(4 * B), (long long)B);
  return 0;
}
