"""Example3 analog (Example3.scala:12-52): byte-identical pipeline to
example2; only the broker address changes to the in-cluster name
(Example3.scala:13) — environment addressing is a flag here, not code."""

import runpy
import sys

if __name__ == "__main__":
    if "--broker" not in sys.argv:
        sys.argv += ["--broker", "http://orion:1026"]
    runpy.run_path(__file__.replace("example3", "example2"), run_name="__main__")
