"""Verify gxx_sort reproduces g++ std::sort exactly, including the order of
equal elements — that order is load-bearing for byte-identical GFF output."""

import random
import subprocess
import sys
from pathlib import Path

import pytest

from sibeliaz_tpu.core.gxxsort import gxx_sort

CXX_PROG = r"""
#include <algorithm>
#include <cstdio>
#include <vector>
#include <utility>
int main() {
    int n;
    if (scanf("%d", &n) != 1) return 1;
    std::vector<std::pair<int,int>> v(n);
    for (int i = 0; i < n; i++) { scanf("%d", &v[i].first); v[i].second = i; }
    std::sort(v.begin(), v.end(),
              [](const std::pair<int,int>& a, const std::pair<int,int>& b) {
                  return a.first < b.first;
              });
    for (auto& p : v) printf("%d %d\n", p.first, p.second);
    return 0;
}
"""


@pytest.fixture(scope="module")
def cxx_sorter(tmp_path_factory):
    d = tmp_path_factory.mktemp("cxx")
    src = d / "s.cpp"
    src.write_text(CXX_PROG)
    exe = d / "s"
    subprocess.run(
        ["g++", "-O2", "-o", str(exe), str(src)], check=True, capture_output=True
    )
    return exe


def run_cxx(exe, keys):
    inp = f"{len(keys)}\n" + " ".join(map(str, keys))
    out = subprocess.run([str(exe)], input=inp, capture_output=True, text=True, check=True)
    pairs = [tuple(map(int, line.split())) for line in out.stdout.splitlines()]
    return pairs


@pytest.mark.parametrize("n,dup", [(0, 1), (1, 1), (5, 2), (16, 3), (17, 3),
                                   (100, 5), (1000, 7), (1000, 2), (5000, 50),
                                   (5000, 1)])
def test_matches_gcc_std_sort(cxx_sorter, n, dup):
    rng = random.Random(n * 1000 + dup)
    keys = [rng.randrange(max(1, n // dup)) for _ in range(n)]
    expect = run_cxx(cxx_sorter, keys)
    got = list(enumerate(keys))
    gxx_sort(got, lambda a, b: a[1] < b[1])
    got = [(k, i) for i, k in got]
    assert got == expect


def test_heapsort_fallback_matches(cxx_sorter):
    # Median-of-3 killer style input to drive deep recursion → heap fallback.
    n = 2048
    keys = list(range(n // 2)) * 2
    # Organ-pipe permutation with many duplicates.
    keys = keys[::2] + keys[1::2][::-1]
    expect = run_cxx(cxx_sorter, keys)
    got = list(enumerate(keys))
    gxx_sort(got, lambda a, b: a[1] < b[1])
    got = [(k, i) for i, k in got]
    assert got == expect
