"""Native host-side F+tree multinomial sampler (reference:
benchmarks/random_sampling; the C++ analog of photon's 'generate native code
at runtime' — built by g++ on first use)."""

import numpy as np

from laser_tpu import host

vocab = 50_000
w = np.random.RandomState(0).rand(vocab).astype(np.float32)

s = host.FenwickSampler(w)
print("total weight:", s.total)

draws = s.sample(10, seed=42)
print("10 draws     :", draws)

unique = s.sample(10, seed=42, replacement=False)
print("10 w/o repl  :", unique, "(unique:", len(set(unique.tolist())) == 10, ")")

s.update(123, 1e9)  # O(log n) weight update — the F+tree superpower
print("after boost  :", s.sample(5, seed=1))
