"""Native C++ meta builder vs the pure-Python reference implementation."""

import numpy as np
import pytest

from sduss_tpu.native import build_patch_meta_native, get_lib
from sduss_tpu.ops import patching


def python_meta(grids, patch_cells=8, pb=(64,), ib=(8,)):
    """Force the pure-Python path by building outside the native branch."""
    import os

    import sduss_tpu.native as native_mod

    os.environ["SDUSS_DISABLE_NATIVE"] = "1"
    native_mod._TRIED, native_mod._LIB = False, None
    patching.build_meta.cache_clear()
    try:
        return patching.build_meta(tuple(grids), patch_cells, pb, ib)
    finally:
        os.environ.pop("SDUSS_DISABLE_NATIVE", None)
        native_mod._TRIED, native_mod._LIB = False, None
        patching.build_meta.cache_clear()


class TestNativeMetaBuilder:
    def test_library_builds(self):
        assert get_lib() is not None, "g++ toolchain should build the native lib"

    @pytest.mark.parametrize("grids", [(2,), (2, 3), (4, 2, 3), (1, 1)])
    def test_matches_python_layout(self, grids):
        py = python_meta(grids)
        nat = build_patch_meta_native(np.asarray(grids, np.int32),
                                      py.p_pad, py.i_pad, py.max_pp)
        assert nat is not None
        image_id, neighbors, group_gather, patch_pos, kv_mask = nat
        np.testing.assert_array_equal(image_id, py.image_id)
        np.testing.assert_array_equal(neighbors, py.neighbors)
        np.testing.assert_array_equal(group_gather, py.group_gather)
        np.testing.assert_array_equal(patch_pos, py.patch_pos)
        np.testing.assert_array_equal(kv_mask, py.kv_mask)

    def test_build_meta_uses_native(self):
        patching.build_meta.cache_clear()
        m = patching.build_meta((3, 2), 8, (16,), (4,))
        assert m.n_patches == 13
        assert m.image_id.dtype == np.int32
