"""Package the engine for spark-submit --py-files.

Zips readability_core + readability_spark (sources only) into
build/readability.zip — the artifact executors import from.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "build", "readability.zip")


def main() -> str:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        for pkg in ("readability_core", "readability_spark"):
            for root, _dirs, files in os.walk(os.path.join(REPO, pkg)):
                if "__pycache__" in root:
                    continue
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        z.write(full, os.path.relpath(full, REPO))
    print(OUT)
    return OUT


if __name__ == "__main__":
    main()
