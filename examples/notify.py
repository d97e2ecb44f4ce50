"""Notification generator — the curl_Notification.sh analog
(/root/reference/files/example1/curl_Notification.sh:1-29 and
files/example5/curl_Notification.sh): POSTs randomized NGSI payloads at
a fixed interval until Ctrl-C."""

from __future__ import annotations

import argparse
import random
import sys
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from tests.fixtures import bus_payload, flat_payload  # noqa: E402

if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--port", type=int, default=9001)
    p.add_argument("--interval", type=float, default=1.0)
    p.add_argument("--nested", action="store_true", help="send example5 bus payloads")
    args = p.parse_args()
    rng = random.Random()
    url = f"http://127.0.0.1:{args.port}/notify"
    while True:
        if args.nested:
            body = bus_payload(rng.randint(10, 53), rng.randint(10, 44))
        else:
            body = flat_payload(float(rng.randint(18, 53)), float(rng.randint(1, 3113)))
        req = urllib.request.Request(
            url,
            data=body.encode(),
            headers={
                "Content-Type": "application/json",
                "Fiware-Service": "demo",
                "Fiware-ServicePath": "/test",
            },
        )
        try:
            urllib.request.urlopen(req, timeout=5)
            print(".", end="", flush=True)
        except OSError as e:
            print(f"\nPOST failed: {e}", file=sys.stderr)
        time.sleep(args.interval)
