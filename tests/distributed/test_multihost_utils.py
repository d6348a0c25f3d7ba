"""Multi-host utilities: single-process no-op paths + pod-mesh layout."""
import numpy as np

import jax

from nmvllm_tpu.parallel.multihost import (assert_same_across_hosts,
                                           broadcast_py, build_pod_mesh,
                                           init_multihost)


def test_single_host_noops():
    assert init_multihost() == 0
    obj = {"reqs": [1, 2, 3], "params": "x"}
    assert broadcast_py(obj) == obj
    assert_same_across_hosts(obj)  # must not raise


def test_pod_mesh_host_major_layout():
    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")
    mesh = build_pod_mesh(2, 4)
    assert mesh.shape == {"data": 2, "sp": 1, "tp": 4}
    # tp groups contiguous in device-id order (ICI locality proxy).
    ids = np.vectorize(lambda d: d.id)(mesh.devices).reshape(2, 4)
    for row in ids:
        assert list(row) == sorted(row)
        assert row[-1] - row[0] == 3
