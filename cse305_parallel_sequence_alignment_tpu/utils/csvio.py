"""CSV result writers, byte-compatible with the reference harness schemas.

The reference writes three CSVs (test_functions/testing.cpp:105-110,
233-238, 317-322); doubles are formatted like C++ ``operator<<`` default
(6 significant digits), so files diff clean against reference output.
"""

from __future__ import annotations

import os


def _open_out(path):
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    return open(path, "w")


def _cpp_double(x) -> str:
    """Format a float the way C++ default ostream does (%.6g semantics)."""
    return f"{float(x):.6g}"


def write_input_size_csv(path, rows):
    """rows: iterable of (test_number, input_size, exec_time_seconds).
    Schema: testing.cpp:108-109, 161-163."""
    with _open_out(path) as f:
        f.write("Testing with different input sizes\n")
        f.write("Test number,Input size,Execution time\n")
        for (j, size, t) in rows:
            f.write(f"{j},{_cpp_double(size)},{_cpp_double(t)}\n")


def write_n_cores_csv(path, rows):
    """rows: iterable of (test_number, n_cores, exec_time_seconds).
    Schema: testing.cpp:236-237, 282-284."""
    with _open_out(path) as f:
        f.write("Testing with different number of cores\n")
        f.write("Test number,Number of cores,Execution time\n")
        for (j, cores, t) in rows:
            f.write(f"{j},{_cpp_double(cores)},{_cpp_double(t)}\n")


def write_similarity_csv(path, rows):
    """rows: iterable of (test_number, similarity, exec_time_seconds).
    Schema: testing.cpp:320-321, 364-366."""
    with _open_out(path) as f:
        f.write("Testing with similarity computation\n")
        f.write("Test number,Similarity,Execution time\n")
        for (j, sim, t) in rows:
            f.write(f"{j},{_cpp_double(sim)},{_cpp_double(t)}\n")
