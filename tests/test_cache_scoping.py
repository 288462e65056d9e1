"""The persistent-XLA-cache default dir must be scoped per host-CPU.

XLA:CPU AOT cache keys don't include host machine features, so a cache
written on one machine type loads on another and can SIGILL (observed as
cpu_aot_loader machine-feature mismatch warnings). The package therefore
hashes /proc/cpuinfo identity into the default cache path; an explicit
JAX_COMPILATION_CACHE_DIR still wins untouched.
"""
import mri_super_resolution_tpu as pkg


def test_host_fingerprint_is_stable_and_short():
    a, b = pkg._host_fingerprint(), pkg._host_fingerprint()
    assert a == b
    assert len(a) == 12
    int(a, 16)  # hex


def test_fingerprint_reflects_cpu_identity(monkeypatch):
    # a different cpuinfo must produce a different fingerprint
    import builtins
    import io

    real_open = builtins.open

    def fake_open(path, *a, **k):
        if path == "/proc/cpuinfo":
            return io.StringIO(
                "model name\t: Imaginary CPU 9000\nflags\t\t: fma avx512f\n")
        return real_open(path, *a, **k)

    monkeypatch.setattr(builtins, "open", fake_open)
    assert pkg._host_fingerprint() != ""
    fp = pkg._host_fingerprint()
    monkeypatch.undo()
    assert fp != pkg._host_fingerprint()
