"""Native loader-core tests: C++ vs numpy parity + prefetch loader."""
import numpy as np
import pytest

from omni_pq_tpu import native
from omni_pq_tpu.data.spatial import spatial_sort
from omni_pq_tpu.data.loader import Loader, PrefetchLoader


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native lib unavailable (no g++)")
    return lib


class TestNative:
    def test_morton_matches_numpy(self, lib, rng):
        pts = rng.uniform(-3, 5, (5000, 3)).astype(np.float32)
        got = native.morton_argsort(pts)
        want = spatial_sort(pts)
        # orders must agree where codes are distinct; compare the codes of
        # the sorted sequences (stable sorts may differ on exact ties)
        from omni_pq_tpu.data.spatial import morton_code
        codes = morton_code(pts)
        np.testing.assert_array_equal(codes[got], codes[want])

    def test_votes_match_numpy(self, lib, rng):
        n = 2000
        pc = rng.uniform(0, 4, (n, 3)).astype(np.float32)
        inst = rng.integers(-1, 5, n).astype(np.int64)
        care = (rng.uniform(size=n) > 0.3)
        # make care consistent per instance (the reference checks point 0)
        gt = rng.uniform(0, 4, (8, 3)).astype(np.float32)
        v1, m1, p1 = native.compute_votes(pc, inst, care, gt)
        # force the numpy fallback
        old = native._lib
        native._lib, native._tried = None, True
        try:
            v2, m2, p2 = native.compute_votes(pc, inst, care, gt)
        finally:
            native._lib = old
        np.testing.assert_array_equal(m1, m2)
        np.testing.assert_array_equal(p1, p2)
        np.testing.assert_allclose(v1, v2, atol=1e-6)

    def test_gather_rows(self, lib, rng):
        src = rng.normal(size=(100, 7)).astype(np.float32)
        ch = rng.integers(0, 100, 30).astype(np.int64)
        np.testing.assert_array_equal(native.gather_rows(src, ch), src[ch])


class FakeDS:
    def __len__(self):
        return 10

    def __getitem__(self, i):
        return {"x": np.full((4,), i, np.float32)}


class TestPrefetchLoader:
    def test_same_batches_as_plain(self):
        plain = Loader(FakeDS(), 2, shuffle=True, seed=3)
        pre = PrefetchLoader(Loader(FakeDS(), 2, shuffle=True, seed=3),
                             num_workers=2)
        a = [b["x"][:, 0].tolist() for b in plain]
        b = [b["x"][:, 0].tolist() for b in pre]
        assert a == b
