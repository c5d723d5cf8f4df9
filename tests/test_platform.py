"""Platform selection / compilation-cache keying regression tests."""

import io
from unittest import mock

from yolo_re_tpu.utils import platform as plat

CPUINFO_A = """\
processor\t: 0
cpu family\t: 6
model\t\t: 207
model name\t: Intel(R) Xeon(R) Processor @ 2.10GHz
stepping\t: 2
microcode\t: 0x1
cpuid level\t: 32
flags\t\t: fpu vme de pse avx512f amx-tile

processor\t: 1
cpu family\t: 6
model\t\t: 207
"""

# Same flags line, different CPUID model — the live cross-host AOT
# poisoning case (LLVM derives tuning features like prefer-no-gather
# from the model, so artifacts are incompatible even with equal flags).
CPUINFO_B = CPUINFO_A.replace("model\t\t: 207", "model\t\t: 143")


def _fingerprint_for(text):
    with mock.patch("builtins.open", return_value=io.StringIO(text)):
        return plat._cpu_fingerprint()


def test_fingerprint_differs_across_cpuid_models():
    fa = _fingerprint_for(CPUINFO_A)
    fb = _fingerprint_for(CPUINFO_B)
    assert fa != fb
    assert len(fa) == len(fb) == 8


def test_fingerprint_stable_and_first_core_only():
    assert _fingerprint_for(CPUINFO_A) == _fingerprint_for(CPUINFO_A)
    # appending more cores after the first blank line must not change it
    extended = CPUINFO_A + "\nstepping\t: 9\nflags\t\t: different\n"
    assert _fingerprint_for(CPUINFO_A) == _fingerprint_for(extended)


def test_fingerprint_missing_cpuinfo():
    with mock.patch("builtins.open", side_effect=OSError):
        assert plat._cpu_fingerprint() == "nofpr"


def test_cache_dir_empty_env_falls_back(monkeypatch):
    # An EMPTY env var must not produce a relative "-<hash>" directory
    # (it did once: cache artifacts landed in the repo root).
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "")
    d = plat.cache_dir()
    assert d.startswith("/")
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/tmp/somewhere")
    assert plat.cache_dir().startswith("/tmp/somewhere-")
