#!/usr/bin/env bash
# CI entry point (parity with the reference's GitHub workflow: import smoke
# test + fast tests; runs on CPU with 8 virtual devices via tests/conftest).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== native audio library"
make -C qwen3_asr_tpu/audio/csrc

echo "== lint"
if command -v ruff >/dev/null 2>&1; then
  ruff check qwen3_asr_tpu tests tools bench.py __graft_entry__.py
else
  # No linter ships in this image (installs forbidden): tools/lint.py is a
  # first-party AST subset of ruff's F401/F811/E999/W191/W291/E501.
  python tools/lint.py
fi

echo "== import smoke test"
JAX_PLATFORMS=cpu python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import qwen3_asr_tpu
assert len(qwen3_asr_tpu.__all__) > 20
print("import ok:", qwen3_asr_tpu.__version__)
EOF

echo "== tests (fast tier)"
python -m pytest tests/ -q -m "not slow"

echo "== package build check"
# Parity with the reference's publish workflow (publish.yml: build +
# twine check).  No `build`/`twine` in this image; pip wheel +
# metadata/content assertions cover the same failure modes offline.
PKG_DIR="$(mktemp -d)"
python -m pip wheel . --no-deps --no-build-isolation -w "$PKG_DIR" -q
rm -rf build qwen3_asr_tpu.egg-info   # setuptools side-products
python - "$PKG_DIR" <<'EOF'
import sys, zipfile
from pathlib import Path

whl = next(Path(sys.argv[1]).glob("qwen3_asr_tpu-*.whl"))
names = zipfile.ZipFile(whl).namelist()
meta = next(n for n in names if n.endswith("METADATA"))
text = zipfile.ZipFile(whl).read(meta).decode()
assert "Name: qwen3-asr-tpu" in text and "Version: " in text, "bad metadata"
assert any(n.endswith("qwen3_asr_tpu/api.py") for n in names), "package missing"
assert any(n.endswith("audio/csrc/audio.cc") for n in names), "csrc missing"
print(f"package ok: {whl.name} ({len(names)} files)")
EOF
rm -rf "$PKG_DIR"

echo "== multichip dryrun"
JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=8" \
python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as ge
ge.dryrun_multichip(8)
EOF

echo "CI OK"
