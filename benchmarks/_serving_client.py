"""Client worker process for bench_serving.py.

Lives in its own module so multiprocessing's *spawn* context can import it
without re-running bench_serving's module top-level (which claims the chip
lock and imports JAX — the original fork context deadlocked: forking a
JAX-multithreaded parent wedges the child, which is exactly how the first
native-server chip run died after its first concurrency level).
Stdlib + nothing else: spawn startup stays milliseconds. The wire framing
here deliberately does NOT reuse hyperdb_tpu.client (which would pull
numpy into every spawn child and add per-call library overhead to the
measurement): the formats are frozen by tests/test_native_server.py and
tests/test_client.py, so drift shows up as test failures, not silent skew.
"""

from __future__ import annotations

import http.client
import socket
import threading
import time


def _pipelined_loop_factory(port, bodies, path, ctype, accept, stop_at,
                            count_lock, counts, lats, ramp, seconds, depth,
                            errs):
    """Raw-socket client with HTTP/1.1 pipelining: keeps ``depth`` requests
    outstanding per connection (responses return in request order, so a
    FIFO of send timestamps gives exact per-request latency). A few
    pipelined connections drive flush depths that would otherwise need
    thousands of client threads."""
    from collections import deque

    head_tmpl = (f"POST {path} HTTP/1.1\r\nHost: x\r\n"
                 f"Content-Type: {ctype}\r\n"
                 + (f"Accept: {accept}\r\n" if accept else "")
                 + "Content-Length: %d\r\n\r\n")
    reqs = [(head_tmpl % len(b)).encode() + b for b in bodies]

    def connect():
        sock = socket.create_connection(("127.0.0.1", port))
        sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        return sock

    def read_response(sock, buf):
        while True:
            hdr_end = buf.find(b"\r\n\r\n")
            if hdr_end >= 0:
                break
            chunk = sock.recv(262144)
            if not chunk:
                raise ConnectionError("eof")
            buf += chunk
        head = buf[:hdr_end]
        status = int(head.split(b" ", 2)[1])
        clen = 0
        for line in head.split(b"\r\n")[1:]:
            if line[:15].lower() == b"content-length:":
                clen = int(line[15:])
                break
        total = hdr_end + 4 + clen
        while len(buf) < total:
            chunk = sock.recv(262144)
            if not chunk:
                raise ConnectionError("eof")
            buf += chunk
        return status, buf[total:]

    def loop(tid):
        n = len(reqs)
        while True:
            if time.perf_counter() >= stop_at:
                return
            try:
                sock = connect()
            except OSError:
                time.sleep(0.05)
                continue
            buf = b""
            sent = deque()
            i = tid
            try:
                while True:
                    now = time.perf_counter()
                    if now >= stop_at:
                        return
                    while len(sent) < depth:
                        sock.sendall(reqs[i % n])
                        sent.append(time.perf_counter())
                        i += 1
                    status, buf = read_response(sock, buf)
                    t1 = time.perf_counter()
                    t0 = sent.popleft()
                    if status != 200:
                        raise RuntimeError(status)
                    if (t0 - (stop_at - ramp - seconds) >= ramp
                            and t1 <= stop_at):
                        with count_lock:
                            counts[0] += 1
                            lats.append(t1 - t0)
            except Exception:
                if time.perf_counter() - (stop_at - seconds) >= 0:
                    with count_lock:
                        errs[0] += 1
                try:
                    sock.close()
                except OSError:
                    pass

    return loop


def _raw_loop_factory(port, bodies, path, ctype, accept, stop_at,
                      count_lock, counts, lats, ramp, seconds, errs):
    """Raw-socket client loop: requests are PRE-SERIALIZED byte strings and
    the response parse is a header scan + Content-Length read. http.client
    costs ~0.5-1 ms of Python per request — at 1k+ q/s targets the client
    harness itself becomes the measurement, so the hot path avoids it."""
    head_tmpl = (f"POST {path} HTTP/1.1\r\nHost: x\r\n"
                 f"Content-Type: {ctype}\r\n"
                 + (f"Accept: {accept}\r\n" if accept else "")
                 + "Content-Length: %d\r\n\r\n")
    reqs = [(head_tmpl % len(b)).encode() + b for b in bodies]

    def connect():
        sock = socket.create_connection(("127.0.0.1", port))
        sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        return sock

    def read_response(sock, buf):
        # returns (status, leftover) or raises on EOF
        while True:
            hdr_end = buf.find(b"\r\n\r\n")
            if hdr_end >= 0:
                break
            chunk = sock.recv(65536)
            if not chunk:
                raise ConnectionError("eof")
            buf += chunk
        head = buf[:hdr_end]
        status = int(head.split(b" ", 2)[1])
        clen = 0
        for line in head.split(b"\r\n")[1:]:
            if line[:15].lower() == b"content-length:":
                clen = int(line[15:])
                break
        total = hdr_end + 4 + clen
        while len(buf) < total:
            chunk = sock.recv(65536)
            if not chunk:
                raise ConnectionError("eof")
            buf += chunk
        return status, buf[total:]

    def loop(tid):
        sock = connect()
        buf = b""
        i = tid
        n = len(reqs)
        while True:
            now = time.perf_counter()
            if now >= stop_at:
                break
            t0 = now
            try:
                sock.sendall(reqs[i % n])
                status, buf = read_response(sock, buf)
                if status != 200:
                    raise RuntimeError(status)
            except Exception:
                if time.perf_counter() - (stop_at - seconds) >= 0:
                    with count_lock:
                        errs[0] += 1
                try:
                    sock.close()
                except OSError:
                    pass
                buf = b""
                try:
                    sock = connect()
                except OSError:
                    time.sleep(0.05)
                continue
            i += 1
            t1 = time.perf_counter()
            if t0 - (stop_at - ramp - seconds) >= ramp and t1 <= stop_at:
                with count_lock:
                    counts[0] += 1
                    lats.append(t1 - t0)
        sock.close()

    return loop


def worker_main(port, bodies, n_threads, seconds, ramp, out_q,
                path="/query", ctype="application/json", accept=None,
                pipeline=1):
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
    errs = [0]  # in-measurement-window failed requests (non-200 / drops)

    if ctype in ("application/octet-stream", "text/plain"):
        if pipeline > 1:
            loop = _pipelined_loop_factory(
                port, bodies, path, ctype, accept, stop_at,
                count_lock, counts, lats, ramp, seconds, pipeline, errs)
        else:
            loop = _raw_loop_factory(
                port, bodies, path, ctype, accept, stop_at,
                count_lock, counts, lats, ramp, seconds, errs)
        threads = [threading.Thread(target=loop, args=(t,))
                   for t in range(n_threads)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        out_q.put((counts[0], lats, errs[0]))
        return

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
                if time.perf_counter() - (stop_at - seconds) >= 0:
                    with count_lock:
                        errs[0] += 1
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
    out_q.put((counts[0], lats, errs[0]))
