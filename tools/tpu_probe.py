"""Tunnel-health probe: attach, run one tiny matmul, exit cleanly.

The axon tunnel wedges when TPU clients are killed mid-attach (CLAUDE.md);
a probe must never need killing. Backend init + a 128x128 matmul run in a
daemon thread; the main thread gives it --wait seconds and then exits 0
(OK), 2 (wedged/timeout) via os._exit — a normal process exit that closes
the socket with FIN rather than a SIGKILL RST.

Usage: python tools/tpu_probe.py [--wait 90]
"""
from __future__ import annotations

import argparse
import os
import sys
import threading
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wait", type=float, default=90.0)
    wait = ap.parse_args().wait

    # Relay-port liveness first, without creating a jax client: when the
    # host-side tunnel is down the ports REFUSE, and a jax attach would
    # connect-retry forever instead of failing (CLAUDE.md).
    import socket

    for port in (8083, 8082):
        s = socket.socket()
        s.settimeout(3)
        try:
            s.connect(("127.0.0.1", port))
            s.close()
            break
        except OSError:
            s.close()
    else:
        print("TPU RELAY DOWN (8082/8083 refused; host tunnel absent)",
              flush=True)
        os._exit(3)

    state = {"ok": False, "err": None}

    def attach():
        try:
            import jax
            import jax.numpy as jnp

            dev = jax.devices()[0]
            x = jax.device_put(jnp.ones((128, 128), jnp.bfloat16), dev)
            s = float(jnp.sum(jax.jit(lambda a: a @ a)(x)))
            # ones @ ones = 128 per entry; sum = 128^3 (exact in bf16: 2^21)
            state["ok"] = s == 128.0**3
            if not state["ok"]:
                state["err"] = f"matmul miscompute: sum={s}, want {128.0**3}"
        except Exception as e:  # noqa: BLE001 — report, don't raise in thread
            state["err"] = repr(e)

    t = threading.Thread(target=attach, daemon=True)
    t0 = time.time()
    t.start()
    t.join(wait)
    dt = time.time() - t0
    if state["ok"]:
        print(f"TPU OK ({dt:.1f}s)", flush=True)
        os._exit(0)
    if state["err"]:
        print(f"TPU ERROR after {dt:.1f}s: {state['err']}", flush=True)
        os._exit(1)
    print(f"TPU WEDGED (no backend after {dt:.1f}s)", flush=True)
    os._exit(2)


if __name__ == "__main__":
    main()
