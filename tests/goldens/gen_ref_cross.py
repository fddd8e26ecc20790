"""Generate v1 cross-check goldens from the REFERENCE rANS coder.

Hardens the v1 bit-exactness claim (round-1 VERDICT "weak" #4): the
reference's own ``rans_interface.cpp`` — compiled unmodified in /tmp
against a stub pybind11 header and a spec-derived ``rans64.h`` (the
third_party header the reference does not vendor) — produces the
streams stored in ``ref_cross.json``. The committed test
(tests/test_ref_cross.py) then asserts our coders encode byte-identical
streams and decode the reference-made streams, without needing the
reference at test time.

Run on a machine with /root/reference present:
    python tests/goldens/gen_ref_cross.py
"""

from __future__ import annotations

import base64
import json
import os
import struct
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

REF_RANS = "/root/reference/cra5/models/compressai/cpp_exts/rans"

PYBIND_STUB = """\
#pragma once
#include <string>
#include <vector>
#include <cstdint>
namespace pybind11 {
using bytes = std::string;
struct _attr { template <class T> _attr &operator=(const T &) { return *this; } };
struct module_ { _attr attr(const char *) { return {}; } _attr doc() { return {}; } };
using module = module_;
template <class... Ts> inline int init() { return 0; }
template <class T> struct class_ {
  class_(module_ &, const char *) {}
  template <class... A> class_ &def(A &&...) { return *this; }
};
}
#define PYBIND11_MODULE(name, var) \\
  static void _pybind_stub_##name(::pybind11::module_ &var); \\
  static void _pybind_stub_##name(::pybind11::module_ &var)
"""

RANS64_H = """\
// Self-written implementation of the public ryg_rans 64-bit rANS API.
#pragma once
#include <cassert>
#include <cstdint>
#define RANS64_L (1ull << 31)
#define Rans64Assert assert
typedef uint64_t Rans64State;
static inline void Rans64EncInit(Rans64State *r) { *r = RANS64_L; }
static inline void Rans64EncPut(Rans64State *r, uint32_t **pptr,
                                uint32_t start, uint32_t freq,
                                uint32_t scale_bits) {
  uint64_t x = *r;
  uint64_t x_max = ((RANS64_L >> scale_bits) << 32) * freq;
  if (x >= x_max) { *pptr -= 1; **pptr = (uint32_t)x; x >>= 32; }
  *r = ((x / freq) << scale_bits) + (x % freq) + start;
}
static inline void Rans64EncFlush(Rans64State *r, uint32_t **pptr) {
  uint64_t x = *r;
  *pptr -= 2;
  (*pptr)[0] = (uint32_t)(x >> 0);
  (*pptr)[1] = (uint32_t)(x >> 32);
}
static inline void Rans64DecInit(Rans64State *r, uint32_t **pptr) {
  uint64_t x = (uint64_t)((*pptr)[0]) | ((uint64_t)((*pptr)[1]) << 32);
  *pptr += 2;
  *r = x;
}
static inline uint32_t Rans64DecGet(Rans64State *r, uint32_t scale_bits) {
  return *r & ((1u << scale_bits) - 1);
}
static inline void Rans64DecAdvance(Rans64State *r, uint32_t **pptr,
                                    uint32_t start, uint32_t freq,
                                    uint32_t scale_bits) {
  uint64_t mask = (1ull << scale_bits) - 1;
  uint64_t x = *r;
  x = freq * (x >> scale_bits) + (x & mask) - start;
  if (x < RANS64_L) { x = (x << 32) | **pptr; *pptr += 1; }
  *r = x;
}
"""

DRIVER = """\
// File-protocol driver around the reference rANS classes.
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>
#include "rans_interface.hpp"
static std::vector<int32_t> read_i32(FILE *f, size_t n) {
  std::vector<int32_t> v(n);
  if (fread(v.data(), 4, n, f) != n) { fprintf(stderr, "short read\\n"); exit(2); }
  return v;
}
int main(int argc, char **argv) {
  if (argc < 4) return 2;
  std::string mode = argv[1];
  FILE *f = fopen(argv[2], "rb");
  if (!f) return 2;
  int32_t n; if (fread(&n, 4, 1, f) != 1) return 2;
  auto symbols = read_i32(f, n);
  auto indexes = read_i32(f, n);
  int32_t n_cdfs, stride;
  if (fread(&n_cdfs, 4, 1, f) != 1 || fread(&stride, 4, 1, f) != 1) return 2;
  auto flat = read_i32(f, (size_t)n_cdfs * stride);
  std::vector<std::vector<int32_t>> cdfs(n_cdfs);
  for (int i = 0; i < n_cdfs; ++i)
    cdfs[i].assign(flat.begin() + (size_t)i * stride,
                   flat.begin() + (size_t)(i + 1) * stride);
  auto sizes = read_i32(f, n_cdfs);
  auto offsets = read_i32(f, n_cdfs);
  fclose(f);
  if (mode == "encode") {
    RansEncoder enc;
    std::string s = enc.encode_with_indexes(symbols, indexes, cdfs, sizes, offsets);
    FILE *o = fopen(argv[3], "wb");
    fwrite(s.data(), 1, s.size(), o);
    fclose(o);
  } else if (mode == "decode" && argc >= 5) {
    FILE *sf = fopen(argv[3], "rb");
    if (!sf) return 2;
    std::string stream; char buf[65536]; size_t got;
    while ((got = fread(buf, 1, sizeof buf, sf)) > 0) stream.append(buf, got);
    fclose(sf);
    RansDecoder dec;
    auto out = dec.decode_with_indexes(stream, indexes, cdfs, sizes, offsets);
    FILE *o = fopen(argv[4], "wb");
    fwrite(out.data(), 4, out.size(), o);
    fclose(o);
  } else return 2;
  return 0;
}
"""


def build_driver(workdir: str) -> str:
    os.makedirs(os.path.join(workdir, "pybind11"), exist_ok=True)
    with open(os.path.join(workdir, "pybind11", "pybind11.h"), "w") as f:
        f.write(PYBIND_STUB)
    with open(os.path.join(workdir, "pybind11", "stl.h"), "w") as f:
        f.write("#pragma once\n")
    with open(os.path.join(workdir, "rans64.h"), "w") as f:
        f.write(RANS64_H)
    with open(os.path.join(workdir, "driver.cpp"), "w") as f:
        f.write(DRIVER)
    exe = os.path.join(workdir, "gen")
    subprocess.run(
        ["g++", "-O2", "-std=c++17", f"-I{workdir}", f"-I{REF_RANS}",
         os.path.join(REF_RANS, "rans_interface.cpp"),
         os.path.join(workdir, "driver.cpp"), "-o", exe],
        check=True,
    )
    return exe


def pack_case(case) -> bytes:
    sym = np.asarray(case["symbols"], np.int32)
    idx = np.asarray(case["indexes"], np.int32)
    cdfs = np.asarray(case["cdfs"], np.int32)
    sizes = np.asarray(case["cdf_sizes"], np.int32)
    offs = np.asarray(case["offsets"], np.int32)
    return (
        struct.pack("<i", sym.size) + sym.tobytes() + idx.tobytes()
        + struct.pack("<ii", cdfs.shape[0], cdfs.shape[1]) + cdfs.tobytes()
        + sizes.tobytes() + offs.tobytes()
    )


def make_cases():
    from cra5_tpu.entropy.cdf import pmf_to_quantized_cdf

    rng = np.random.default_rng(20260816)
    cases = []

    def build_cdf_table(pmf_lens):
        stride = max(pmf_lens) + 2
        rows, sizes = [], []
        for L in pmf_lens:
            pmf = rng.random(L).astype(np.float32) + 1e-3
            pmf /= pmf.sum()
            pmf *= 0.95  # leave tail mass for the bypass slot
            cdf = np.asarray(pmf_to_quantized_cdf(pmf, 16), np.int32)
            row = np.zeros(stride, np.int32)
            row[: cdf.size] = cdf
            rows.append(row)
            sizes.append(cdf.size)
        return np.stack(rows), np.asarray(sizes, np.int32)

    # 1. single-cdf, in-range symbols only
    cdfs, sizes = build_cdf_table([8])
    n = 64
    cases.append({
        "name": "in_range_single_cdf",
        "symbols": (rng.integers(0, sizes[0] - 2, n) - 3).tolist(),
        "indexes": [0] * n,
        "cdfs": cdfs.tolist(), "cdf_sizes": sizes.tolist(), "offsets": [-3],
    })

    # 2. multi-cdf, mixed indexes
    cdfs, sizes = build_cdf_table([5, 17, 33, 9])
    n = 256
    idx = rng.integers(0, 4, n)
    sym = np.array([rng.integers(0, sizes[i] - 2) for i in idx]) - 2
    cases.append({
        "name": "multi_cdf_mixed",
        "symbols": sym.tolist(), "indexes": idx.tolist(),
        "cdfs": cdfs.tolist(), "cdf_sizes": sizes.tolist(),
        "offsets": [-2, -2, -2, -2],
    })

    # 3. bypass: negative and >=max_value escapes. Magnitudes stay below
    # 2^26 (raw_val < 2^28): the reference encoder's uint32 n_bypass loop
    # (rans_interface.cpp:146-150) hits shift-by-32 UB and hangs above
    # that, so larger values are covered by the fuzz vs rans_py instead.
    cdfs, sizes = build_cdf_table([6, 12])
    sym = [-1000, -1, 0, 3, 50, 4096, 2**20, 2**26 - 1, -(2**26), 2, 1, 7]
    idx = [0, 1] * 6
    cases.append({
        "name": "bypass_edges",
        "symbols": sym, "indexes": idx,
        "cdfs": cdfs.tolist(), "cdf_sizes": sizes.tolist(), "offsets": [0, -5],
    })

    # 4. symbol exactly at max_value (escape with raw_val = 0)
    cdfs, sizes = build_cdf_table([10])
    mv = int(sizes[0] - 2)
    cases.append({
        "name": "at_max_value",
        "symbols": [mv, mv + 1, mv - 1, 0, mv],
        "indexes": [0] * 5,
        "cdfs": cdfs.tolist(), "cdf_sizes": sizes.tolist(), "offsets": [0],
    })

    # 5. long stream, renorm-heavy (low-entropy cdf, frequent escapes)
    cdfs, sizes = build_cdf_table([3])
    n = 4096
    sym = rng.integers(-6, 6, n)
    cases.append({
        "name": "long_low_entropy",
        "symbols": sym.tolist(), "indexes": [0] * n,
        "cdfs": cdfs.tolist(), "cdf_sizes": sizes.tolist(), "offsets": [-1],
    })

    return cases


def main():
    if not os.path.isdir(REF_RANS):
        print(f"reference not found at {REF_RANS}; nothing to do", file=sys.stderr)
        return 1
    from cra5_tpu.coder import native

    out_path = os.path.join(os.path.dirname(__file__), "ref_cross.json")
    goldens = []
    with tempfile.TemporaryDirectory(prefix="refrans_") as workdir:
        exe = build_driver(workdir)
        for case in make_cases():
            inp = os.path.join(workdir, "case.bin")
            ref_stream = os.path.join(workdir, "ref.stream")
            dec_out = os.path.join(workdir, "dec.bin")
            with open(inp, "wb") as f:
                f.write(pack_case(case))
            # reference encodes
            subprocess.run([exe, "encode", inp, ref_stream], check=True)
            ref_bytes = open(ref_stream, "rb").read()
            # our coder must produce the identical stream
            ours = native.encode_with_indexes(
                case["symbols"], case["indexes"], np.asarray(case["cdfs"], np.int32),
                case["cdf_sizes"], case["offsets"],
            )
            assert ours == ref_bytes, f"{case['name']}: our stream != reference stream"
            # reference decodes OUR stream back to the symbols
            ours_stream = os.path.join(workdir, "ours.stream")
            with open(ours_stream, "wb") as f:
                f.write(ours)
            subprocess.run([exe, "decode", inp, ours_stream, dec_out], check=True)
            dec = np.fromfile(dec_out, np.int32)
            assert dec.tolist() == list(case["symbols"]), f"{case['name']}: ref decode mismatch"
            goldens.append({**case, "stream_b64": base64.b64encode(ref_bytes).decode()})
            print(f"{case['name']}: {len(ref_bytes)} bytes OK")

    with open(out_path, "w") as f:
        json.dump({"precision": 16, "bypass_precision": 4, "cases": goldens}, f)
    print(f"wrote {out_path} ({len(goldens)} cases)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
