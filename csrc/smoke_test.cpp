// Sanitizer smoke test for the native resampling kernels: exercises all
// three schemes plus the error paths so ASAN/UBSAN can sweep the memory
// behavior (loop bounds, vector sizing, degenerate inputs).

#include <cassert>
#include <cstdint>
#include <cstdio>
#include <random>
#include <vector>

extern "C" {
int bssm_resample_systematic(int64_t n, const double* w, double u, int32_t* out);
int bssm_resample_stratified(int64_t n, const double* w, const double* us, int32_t* out);
int bssm_resample_multinomial(int64_t n, const double* w, const double* us, int32_t* out);
}

int main() {
  std::mt19937_64 rng(1405);
  std::uniform_real_distribution<double> unif(0.0, 1.0);

  for (int64_t n : {1, 2, 5, 128, 1001}) {
    std::vector<double> w(n), us(n);
    std::vector<int32_t> out(n);
    double total = 0;
    for (auto& x : w) total += (x = unif(rng));
    for (auto& x : us) x = unif(rng);

    assert(bssm_resample_systematic(n, w.data(), unif(rng), out.data()) == 0);
    for (auto i : out) assert(i >= 0 && i < n);
    assert(bssm_resample_stratified(n, w.data(), us.data(), out.data()) == 0);
    for (auto i : out) assert(i >= 0 && i < n);
    assert(bssm_resample_multinomial(n, w.data(), us.data(), out.data()) == 0);
    for (auto i : out) assert(i >= 0 && i < n);
  }

  // Degenerate atom.
  {
    std::vector<double> w = {0.0, 0.0, 1.0, 0.0};
    std::vector<double> us = {0.1, 0.4, 0.7, 0.99};
    std::vector<int32_t> out(4);
    bssm_resample_systematic(4, w.data(), 0.5, out.data());
    for (auto i : out) assert(i == 2);
    bssm_resample_multinomial(4, w.data(), us.data(), out.data());
    for (auto i : out) assert(i == 2);
  }

  // Error codes.
  {
    std::vector<double> neg = {0.5, -0.1};
    std::vector<double> zeros = {0.0, 0.0};
    std::vector<double> us = {0.5, 0.5};
    std::vector<int32_t> out(2);
    assert(bssm_resample_stratified(2, neg.data(), us.data(), out.data()) == 1);
    assert(bssm_resample_stratified(2, zeros.data(), us.data(), out.data()) == 2);
  }

  std::puts("native smoke OK");
  return 0;
}
