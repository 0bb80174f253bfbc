"""Client worker process for bench_serving.py.

Lives in its own module so multiprocessing's *spawn* context can import it
without re-running bench_serving's module top-level (which claims the chip
lock and imports JAX — the original fork context deadlocked: forking a
JAX-multithreaded parent wedges the child, which is exactly how the first
native-server chip run died after its first concurrency level).
Stdlib + nothing else: spawn startup stays milliseconds.
"""

from __future__ import annotations

import http.client
import socket
import threading
import time


def worker_main(port, bodies, n_threads, seconds, ramp, out_q,
                path="/query", ctype="application/json", accept=None):
    """One CLIENT PROCESS: n_threads keep-alive connections hammering
    /query. Clients must not share the server process's GIL (an early cut
    ran 512 client threads in-process and measured python, not the server:
    235 q/s with p50 over a second), so each worker is a separate process
    and reports (count, latencies) through a queue. Requests during the
    ramp are excluded from both."""
    stop_at = time.perf_counter() + ramp + seconds
    count_lock = threading.Lock()
    counts = [0]
    lats = []

    def connect():
        conn = http.client.HTTPConnection("127.0.0.1", port)
        conn.connect()
        # client-side Nagle adds the same ~40 ms the server's
        # disable_nagle_algorithm removes on its side
        conn.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        return conn

    def loop(tid):
        conn = connect()
        i = tid
        n_bodies = len(bodies)
        while True:
            now = time.perf_counter()
            if now >= stop_at:
                break
            body = bodies[i % n_bodies]
            i += 1
            t0 = now
            headers = {"Content-Type": ctype}
            if accept:
                headers["Accept"] = accept
            try:
                conn.request("POST", path, body, headers)
                resp = conn.getresponse()
                payload = resp.read()
                if resp.status != 200:
                    raise RuntimeError(payload[:200])
            except Exception:
                conn.close()
                try:
                    conn = connect()
                except OSError:
                    time.sleep(0.05)
                continue
            t1 = time.perf_counter()
            if t0 - (stop_at - ramp - seconds) >= ramp and t1 <= stop_at:
                with count_lock:
                    counts[0] += 1
                    lats.append(t1 - t0)
        conn.close()

    threads = [threading.Thread(target=loop, args=(t,)) for t in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    out_q.put((counts[0], lats))
