"""Byte I/O over URL protocols (reference: libavformat/avio.h:111
AVIOContext, aviobuf.c buffered reader, url.h:55 URLProtocol, protocols.c
registry; file.c, pipe (fd), http.c, tcp.c, concat, md5 protocols).
"""

from __future__ import annotations

import io
import os
import socket
import sys
import hashlib
from typing import Dict, Optional, Type
from urllib.parse import urlparse

from libav_tpu.avutil.error import AVError, PROTOCOL_NOT_FOUND, EINVAL

SEEK_SET, SEEK_CUR, SEEK_END = 0, 1, 2


class URLProtocol:
    """reference: url.h:55 URLProtocol"""
    NAME = "none"

    @classmethod
    def open(cls, url: str, mode: str) -> "IOContext":
        raise NotImplementedError


_PROTOCOLS: Dict[str, Type[URLProtocol]] = {}


def register_protocol(cls):
    _PROTOCOLS[cls.NAME] = cls
    return cls


class IOContext:
    """reference: avio.h:111 AVIOContext — buffered, seekable byte stream."""

    def __init__(self, fobj, seekable: bool = True, url: str = ""):
        self._f = fobj
        self.seekable = seekable
        self.url = url
        self.error = 0

    def read(self, n: int = -1) -> bytes:
        return self._f.read(n)

    def read_all(self) -> bytes:
        return self._f.read()

    def write(self, data: bytes) -> int:
        return self._f.write(data)

    def tell(self) -> int:
        return self._f.tell()

    def seek(self, pos: int, whence: int = SEEK_SET) -> int:
        if not self.seekable:
            raise AVError(EINVAL, "stream not seekable")
        return self._f.seek(pos, whence)

    def size(self) -> int:
        if not self.seekable:
            return -1
        cur = self.tell()
        end = self._f.seek(0, SEEK_END)
        self._f.seek(cur, SEEK_SET)
        return end

    def close(self):
        if self._f not in (sys.stdin.buffer, sys.stdout.buffer):
            self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()

    # big-endian helpers (reference: avio.h avio_rb16/rb32/...)
    def rb16(self) -> int:
        return int.from_bytes(self.read(2), "big")

    def rb24(self) -> int:
        return int.from_bytes(self.read(3), "big")

    def rb32(self) -> int:
        return int.from_bytes(self.read(4), "big")

    def rb64(self) -> int:
        return int.from_bytes(self.read(8), "big")

    def rl16(self) -> int:
        return int.from_bytes(self.read(2), "little")

    def rl32(self) -> int:
        return int.from_bytes(self.read(4), "little")

    def wb16(self, v: int):
        self.write(v.to_bytes(2, "big"))

    def wb32(self, v: int):
        self.write(v.to_bytes(4, "big"))

    def wl16(self, v: int):
        self.write(v.to_bytes(2, "little"))

    def wl32(self, v: int):
        self.write(v.to_bytes(4, "little"))


@register_protocol
class FileProtocol(URLProtocol):
    """reference: libavformat/file.c"""
    NAME = "file"

    @classmethod
    def open(cls, url: str, mode: str) -> IOContext:
        path = url[len("file:"):] if url.startswith("file:") else url
        f = open(path, "rb" if mode == "r" else "wb")
        return IOContext(f, seekable=True, url=url)


@register_protocol
class PipeProtocol(URLProtocol):
    """reference: libavformat/file.c pipe branch ('pipe:0'/'pipe:1' or '-')"""
    NAME = "pipe"

    @classmethod
    def open(cls, url: str, mode: str) -> IOContext:
        spec = url[len("pipe:"):] if url.startswith("pipe:") else ""
        if mode == "r":
            fd = int(spec) if spec else 0
            f = sys.stdin.buffer if fd == 0 else os.fdopen(fd, "rb")
        else:
            fd = int(spec) if spec else 1
            f = sys.stdout.buffer if fd == 1 else os.fdopen(fd, "wb")
        return IOContext(f, seekable=False, url=url)


@register_protocol
class DataProtocol(URLProtocol):
    """In-memory buffers (test/tooling convenience)."""
    NAME = "mem"
    _store: Dict[str, io.BytesIO] = {}

    @classmethod
    def open(cls, url: str, mode: str) -> IOContext:
        key = url[len("mem:"):]
        if mode == "r":
            buf = cls._store.get(key)
            if buf is None:
                raise AVError(EINVAL, f"no mem buffer {key}")
            return IOContext(io.BytesIO(buf.getvalue()), seekable=True, url=url)
        b = io.BytesIO()
        cls._store[key] = b

        class _Keep(io.BytesIO):
            pass
        return IOContext(b, seekable=True, url=url)

    @classmethod
    def get(cls, key: str) -> bytes:
        return cls._store[key].getvalue()


@register_protocol
class MD5Protocol(URLProtocol):
    """reference: libavformat/md5proto.c — write sink that emits the md5 of
    everything written (FATE 'md5:' output)."""
    NAME = "md5"

    class _MD5Writer:
        def __init__(self, out):
            self.h = hashlib.md5()
            self.out = out
            self.pos = 0

        def write(self, data):
            self.h.update(data)
            self.pos += len(data)
            return len(data)

        def tell(self):
            return self.pos

        def close(self):
            self.out.write(self.h.hexdigest().encode() + b"\n")

    @classmethod
    def open(cls, url: str, mode: str) -> IOContext:
        if mode != "w":
            raise AVError(EINVAL, "md5: is write-only")
        return IOContext(cls._MD5Writer(sys.stdout.buffer), seekable=False, url=url)


@register_protocol
class ConcatProtocol(URLProtocol):
    """reference: libavformat/concat.c — concat:url1|url2|... reads the
    named resources back to back as one stream."""
    NAME = "concat"

    class _Chain:
        def __init__(self, parts):
            self._parts = parts
            self._k = 0

        def read(self, n=-1):
            out = b""
            while self._k < len(self._parts) and (n < 0 or len(out) < n):
                chunk = self._parts[self._k].read(
                    -1 if n < 0 else n - len(out))
                if not chunk:
                    self._parts[self._k].close()
                    self._k += 1
                    continue
                out += chunk
            return out

        def close(self):
            for p in self._parts[self._k:]:
                try:
                    p.close()
                except Exception:
                    pass

    @classmethod
    def open(cls, url: str, mode: str) -> IOContext:
        if mode != "r":
            raise AVError(EINVAL, "concat: read-only")
        names = url.split(":", 1)[1].split("|")
        if not names or not all(names):
            raise AVError(EINVAL, "concat: empty component")
        parts = [url_open(n)._f for n in names]
        return IOContext(cls._Chain(parts), seekable=False, url=url)


@register_protocol
class TCPProtocol(URLProtocol):
    """reference: libavformat/tcp.c (tcp://host:port)"""
    NAME = "tcp"

    @classmethod
    def open(cls, url: str, mode: str) -> IOContext:
        u = urlparse(url)
        if u.port is None:
            raise AVError(EINVAL, "tcp: port required (tcp://host:port)")
        sock = socket.create_connection((u.hostname, u.port))
        f = sock.makefile("rb" if mode == "r" else "wb")
        return IOContext(f, seekable=False, url=url)


@register_protocol
class HTTPProtocol(URLProtocol):
    """reference: libavformat/http.c — read side via urllib."""
    NAME = "http"

    @classmethod
    def open(cls, url: str, mode: str) -> IOContext:
        if mode != "r":
            raise AVError(EINVAL, "http write not supported")
        import urllib.request
        # streaming reads (reference http.c reads chunkwise; the whole
        # body is never buffered); seekability via HTTP range probing
        # is future work, so the context is a forward-only stream
        resp = urllib.request.urlopen(url)
        return IOContext(resp, seekable=False, url=url)


class HTTPSProtocol(HTTPProtocol):
    NAME = "https"


_PROTOCOLS["https"] = HTTPSProtocol


@register_protocol
class UDPProtocol(URLProtocol):
    """reference: libavformat/udp.c (udp://host:port?localport=N).
    Reads are datagram-granular like the reference's recvfrom loop;
    writes send one datagram per write call."""
    NAME = "udp"

    class _Dgram:
        def __init__(self, sock, dest=None):
            self.sock = sock
            self.dest = dest
            self._buf = b""
            self.pos = 0

        def read(self, n=-1):
            if n < 0:
                raise AVError(EINVAL, "udp: bounded reads only")
            while len(self._buf) < n:
                pkt = self.sock.recv(65536)
                if not pkt:
                    break
                self._buf += pkt
            out, self._buf = self._buf[:n], self._buf[n:]
            self.pos += len(out)
            return out

        def write(self, data):
            self.sock.sendto(data, self.dest)
            self.pos += len(data)
            return len(data)

        def tell(self):
            return self.pos

        def close(self):
            self.sock.close()

    @classmethod
    def open(cls, url: str, mode: str) -> IOContext:
        from urllib.parse import parse_qs
        u = urlparse(url)
        opts = {k: v[-1] for k, v in parse_qs(u.query).items()}
        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        if mode == "r":
            sock.bind((u.hostname or "0.0.0.0", u.port or 0))
            if "timeout" in opts:          # microseconds like the reference
                sock.settimeout(float(opts["timeout"]) / 1e6)
            return IOContext(cls._Dgram(sock), seekable=False, url=url)
        if "localport" in opts:
            sock.bind(("0.0.0.0", int(opts["localport"])))
        return IOContext(cls._Dgram(sock, (u.hostname, u.port)),
                         seekable=False, url=url)


@register_protocol
class UnixProtocol(URLProtocol):
    """reference: libavformat/unix.c (unix:///path/to/socket)"""
    NAME = "unix"

    @classmethod
    def open(cls, url: str, mode: str) -> IOContext:
        path = urlparse(url).path or url.split(":", 1)[1]
        sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        sock.connect(path)
        f = sock.makefile("rb" if mode == "r" else "wb")
        return IOContext(f, seekable=False, url=url)


@register_protocol
class TLSProtocol(URLProtocol):
    """reference: libavformat/tls.c (tls://host:port?verify=0&cafile=...)"""
    NAME = "tls"

    @classmethod
    def open(cls, url: str, mode: str) -> IOContext:
        import ssl
        from urllib.parse import parse_qs
        u = urlparse(url)
        if u.port is None:
            raise AVError(EINVAL, "tls: port required (tls://host:port)")
        opts = {k: v[-1] for k, v in parse_qs(u.query).items()}
        ctx = ssl.create_default_context(
            cafile=opts.get("cafile") or None)
        if opts.get("verify", "1") == "0":
            ctx.check_hostname = False
            ctx.verify_mode = ssl.CERT_NONE
        raw = socket.create_connection((u.hostname, u.port))
        sock = ctx.wrap_socket(raw, server_hostname=u.hostname)
        f = sock.makefile("rb" if mode == "r" else "wb")
        return IOContext(f, seekable=False, url=url)


@register_protocol
class SubfileProtocol(URLProtocol):
    """reference: libavformat/subfile.c
    (subfile,,start,N,end,M,,:path — reads bytes [N, M) of path)."""
    NAME = "subfile"

    class _Window:
        def __init__(self, inner, start, end):
            self.inner, self.start, self.end = inner, start, end
            inner.seek(start)

        def read(self, n=-1):
            left = self.end - self.inner.tell()
            if left <= 0:
                return b""
            return self.inner.read(left if n < 0 else min(n, left))

        def tell(self):
            return self.inner.tell() - self.start

        def seek(self, pos, whence=SEEK_SET):
            if whence == SEEK_CUR:
                pos += self.tell()
            elif whence == SEEK_END:
                pos += self.end - self.start
            return self.inner.seek(self.start + pos) - self.start

        def close(self):
            self.inner.close()

    @classmethod
    def open(cls, url: str, mode: str) -> IOContext:
        if mode != "r":
            raise AVError(EINVAL, "subfile: read-only")
        head, path = url.split(":", 1)       # subfile,,k,v,...,,:url
        kv = head[len("subfile"):].strip(",").split(",")
        opts = dict(zip(kv[0::2], kv[1::2]))
        start, end = int(opts.get("start", 0)), int(opts["end"])
        inner = url_open(path, "r")
        return IOContext(cls._Window(inner, start, end),
                         seekable=True, url=url)


@register_protocol
class CacheProtocol(URLProtocol):
    """reference: libavformat/cache.c — makes a forward-only inner
    stream seekable by spooling everything read so far to a temp file."""
    NAME = "cache"

    class _Spool:
        def __init__(self, inner):
            import tempfile
            self.inner = inner
            self.tmp = tempfile.TemporaryFile()
            self.cached = 0
            self.pos = 0
            self.eof = False

        def _fill(self, upto):
            while not self.eof and self.cached < upto:
                chunk = self.inner.read(min(1 << 16, upto - self.cached))
                if not chunk:
                    self.eof = True
                    break
                self.tmp.seek(self.cached)
                self.tmp.write(chunk)
                self.cached += len(chunk)

        def read(self, n=-1):
            if n < 0:
                self._fill(1 << 62)
                n = self.cached - self.pos
            self._fill(self.pos + n)
            self.tmp.seek(self.pos)
            out = self.tmp.read(min(n, self.cached - self.pos))
            self.pos += len(out)
            return out

        def tell(self):
            return self.pos

        def seek(self, pos, whence=SEEK_SET):
            if whence == SEEK_CUR:
                pos += self.pos
            elif whence == SEEK_END:
                self._fill(1 << 62)
                pos += self.cached
            self._fill(pos)
            self.pos = min(pos, self.cached)
            return self.pos

        def close(self):
            self.tmp.close()
            self.inner.close()

    @classmethod
    def open(cls, url: str, mode: str) -> IOContext:
        if mode != "r":
            raise AVError(EINVAL, "cache: read-only")
        inner = url_open(url.split(":", 1)[1], "r")
        return IOContext(cls._Spool(inner), seekable=True, url=url)


@register_protocol
class TeeProtocol(URLProtocol):
    """reference: libavformat/tee_utils / teeproto.c —
    tee:out1|out2 writes everything to every named output."""
    NAME = "tee"

    class _Fan:
        def __init__(self, outs):
            self.outs = outs
            self.pos = 0

        def write(self, data):
            for o in self.outs:
                o.write(data)
            self.pos += len(data)
            return len(data)

        def tell(self):
            return self.pos

        def close(self):
            for o in self.outs:
                o.close()

    @classmethod
    def open(cls, url: str, mode: str) -> IOContext:
        if mode != "w":
            raise AVError(EINVAL, "tee: write-only")
        outs = [url_open(n, "w") for n in url.split(":", 1)[1].split("|")]
        return IOContext(cls._Fan(outs), seekable=False, url=url)


@register_protocol
class FTPProtocol(URLProtocol):
    """reference: libavformat/ftp.c — read side via ftplib."""
    NAME = "ftp"

    @classmethod
    def open(cls, url: str, mode: str) -> IOContext:
        if mode != "r":
            raise AVError(EINVAL, "ftp write not supported")
        import ftplib
        import io as _io
        u = urlparse(url)
        ftp = ftplib.FTP()
        ftp.connect(u.hostname, u.port or 21)
        ftp.login(u.username or "anonymous", u.password or "")
        buf = _io.BytesIO()
        ftp.retrbinary(f"RETR {u.path}", buf.write)
        ftp.quit()
        buf.seek(0)
        return IOContext(buf, seekable=True, url=url)


def url_open(url: str, mode: str = "r") -> IOContext:
    """reference: avio.h avio_open2 -> URLProtocol dispatch"""
    if url == "-":
        return PipeProtocol.open("pipe:", mode)
    scheme = url.split(":", 1)[0] if ":" in url else "file"
    scheme = scheme.split(",", 1)[0]   # subfile,,start,... option syntax
    if len(scheme) <= 1:   # windows-style path or plain file
        scheme = "file"
    proto = _PROTOCOLS.get(scheme, FileProtocol)
    return proto.open(url, mode)
