"""README's perf table must be exactly what the checked-in artifacts
say (VERDICT r3 task #1: 'no number in README an artifact contradicts'
— enforced by generation, not discipline)."""
import subprocess
import sys
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_perf_table_in_sync():
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "benchmarks", "readme_table.py"),
         "--check"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr + r.stdout
