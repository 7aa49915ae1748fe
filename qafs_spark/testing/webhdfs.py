"""In-process WebHDFS REST server backed by a local directory.

Purpose: let the scheme matrix exercise a GENUINELY remote Hadoop
filesystem end-to-end. Every other scheme this container can reach is a
local-FS alias; ``webhdfs://`` goes through
``org.apache.hadoop.hdfs.web.WebHdfsFileSystem`` — real HTTP on the
wire, JSON FileStatus parsing, the two-step create/append dance, ranged
reads — the same client codepath a Knox/HttpFS gateway or remote HDFS
cluster serves in production.

The dialect implemented is the public WebHDFS REST API
(https://hadoop.apache.org/docs/stable/hadoop-project-dist/hadoop-hdfs/WebHDFS.html)
in its HttpFS flavor: one endpoint serves both metadata and data, and
the CREATE/APPEND first step 307-redirects to the same URL with
``data=true`` — exactly how Apache HttpFS keeps the stock WebHdfs client
working without datanodes. Ops covered: GETFILESTATUS, LISTSTATUS, OPEN
(offset/length ranges), CREATE (+overwrite), APPEND, MKDIRS, RENAME,
DELETE (+recursive), and no-op acks for SETPERMISSION/SETTIMES/
SETREPLICATION/SETOWNER so committers that politely chmod don't break.

Threaded stdlib ``http.server`` only — nothing to install; chunked
request bodies (the Java client streams uploads chunked) are decoded by
hand. NOT a production filesystem: no auth, no quotas, single process.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_PREFIX = "/webhdfs/v1"


def _file_status(path: str, suffix: str) -> dict:
    st = os.stat(path)
    is_dir = os.path.isdir(path)
    return {
        "accessTime": int(st.st_atime * 1000),
        "blockSize": 0 if is_dir else 134217728,
        "childrenNum": len(os.listdir(path)) if is_dir else 0,
        "fileId": st.st_ino,
        "group": "supergroup",
        "length": 0 if is_dir else st.st_size,
        "modificationTime": int(st.st_mtime * 1000),
        "owner": "qafs",
        "pathSuffix": suffix,
        "permission": "755" if is_dir else "644",
        "replication": 0 if is_dir else 1,
        "storagePolicy": 0,
        "type": "DIRECTORY" if is_dir else "FILE",
    }


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"  # keep-alive + 100-continue support
    server_version = "qafs-webhdfs/1"
    root: str = "/"

    # -- plumbing ----------------------------------------------------------

    def log_message(self, fmt, *args):  # quiet
        pass

    def _parse(self):
        parsed = urllib.parse.urlsplit(self.path)
        if not parsed.path.startswith(_PREFIX):
            return None, {}
        rel = urllib.parse.unquote(parsed.path[len(_PREFIX):]) or "/"
        q = {k: v[0] for k, v in urllib.parse.parse_qs(parsed.query).items()}
        local = os.path.normpath(
            os.path.join(self.root, rel.lstrip("/"))
        )
        if not (local == self.root or local.startswith(self.root + os.sep)):
            return None, q  # path escape
        return local, q

    def _json(self, code: int, obj: dict) -> None:
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _remote_exc(self, code: int, exc: str, java: str, msg: str) -> None:
        self._json(code, {"RemoteException": {
            "exception": exc, "javaClassName": java, "message": msg,
        }})

    def _not_found(self, rel: str) -> None:
        self._remote_exc(
            404, "FileNotFoundException", "java.io.FileNotFoundException",
            f"File does not exist: {rel}",
        )

    def _redirect_data(self) -> None:
        """HttpFS-style first step of CREATE/APPEND: point the client
        back at this endpoint with data=true."""
        sep = "&" if "?" in self.path else "?"
        loc = f"http://{self.headers['Host']}{self.path}{sep}data=true"
        self.send_response(307)
        self.send_header("Location", loc)
        self.send_header("Content-Length", "0")
        self.end_headers()

    def _read_body(self) -> bytes:
        if self.headers.get("Transfer-Encoding", "").lower() == "chunked":
            chunks = []
            while True:
                size_line = self.rfile.readline().strip()
                size = int(size_line.split(b";")[0], 16)
                if size == 0:
                    self.rfile.readline()  # trailing CRLF
                    break
                chunks.append(self.rfile.read(size))
                self.rfile.read(2)  # chunk CRLF
            return b"".join(chunks)
        n = int(self.headers.get("Content-Length", 0) or 0)
        return self.rfile.read(n) if n else b""

    # -- reads -------------------------------------------------------------

    def do_GET(self):
        local, q = self._parse()
        op = q.get("op", "").upper()
        if local is None:
            return self._remote_exc(
                400, "IllegalArgumentException",
                "java.lang.IllegalArgumentException", "bad path")
        if op == "GETFILESTATUS":
            if not os.path.exists(local):
                return self._not_found(local)
            return self._json(200, {"FileStatus": _file_status(local, "")})
        if op == "LISTSTATUS":
            if not os.path.exists(local):
                return self._not_found(local)
            if os.path.isfile(local):
                statuses = [_file_status(local, os.path.basename(local))]
            else:
                statuses = [
                    _file_status(os.path.join(local, nm), nm)
                    for nm in sorted(os.listdir(local))
                ]
            return self._json(
                200, {"FileStatuses": {"FileStatus": statuses}})
        if op == "OPEN":
            if not os.path.isfile(local):
                return self._not_found(local)
            offset = int(q.get("offset", 0) or 0)
            length = q.get("length")
            size = os.path.getsize(local)
            n = size - offset if length is None else min(
                int(length), size - offset)
            n = max(n, 0)
            with open(local, "rb") as f:
                f.seek(offset)
                data = f.read(n)
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)
            return
        if op == "GETFILEBLOCKLOCATIONS":
            # one synthetic block spanning the requested range — enough
            # for split planning against a non-datanode store
            if not os.path.isfile(local):
                return self._not_found(local)
            size = os.path.getsize(local)
            offset = int(q.get("offset", 0) or 0)
            length = int(q.get("length", size) or size)
            name = f"{self.server.server_address[0]}:50010"
            block = {
                "cachedHosts": [],
                "corrupt": False,
                "hosts": ["localhost"],
                "length": max(min(length, size - offset), 0),
                "names": [name],
                "offset": offset,
                "storageTypes": ["DISK"],
                "topologyPaths": [f"/default-rack/{name}"],
            }
            return self._json(
                200, {"BlockLocations": {"BlockLocation": [block]}})
        if op == "GETCONTENTSUMMARY":
            total = 0
            count_f = count_d = 0
            for dirpath, dirnames, filenames in os.walk(local):
                count_d += len(dirnames)
                count_f += len(filenames)
                total += sum(
                    os.path.getsize(os.path.join(dirpath, fn))
                    for fn in filenames
                )
            return self._json(200, {"ContentSummary": {
                "directoryCount": count_d + 1, "fileCount": count_f,
                "length": total, "quota": -1, "spaceConsumed": total,
                "spaceQuota": -1,
            }})
        self._remote_exc(
            400, "UnsupportedOperationException",
            "java.lang.UnsupportedOperationException", f"GET op {op}")

    # -- writes ------------------------------------------------------------

    def do_PUT(self):
        local, q = self._parse()
        op = q.get("op", "").upper()
        if local is None:
            return self._remote_exc(
                400, "IllegalArgumentException",
                "java.lang.IllegalArgumentException", "bad path")
        if op == "MKDIRS":
            os.makedirs(local, exist_ok=True)
            return self._json(200, {"boolean": True})
        if op == "CREATE":
            if q.get("data") != "true":
                return self._redirect_data()
            overwrite = q.get("overwrite", "false").lower() == "true"
            if os.path.exists(local) and not overwrite:
                return self._remote_exc(
                    403, "FileAlreadyExistsException",
                    "org.apache.hadoop.fs.FileAlreadyExistsException",
                    f"{local} already exists")
            body = self._read_body()
            os.makedirs(os.path.dirname(local), exist_ok=True)
            with open(local, "wb") as f:
                f.write(body)
            self.send_response(201)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        if op == "RENAME":
            dst_rel = q.get("destination", "")
            dst = os.path.normpath(
                os.path.join(self.root, dst_rel.lstrip("/")))
            ok = (
                (dst == self.root or dst.startswith(self.root + os.sep))
                and os.path.exists(local)
                and not os.path.exists(dst)
                and os.path.isdir(os.path.dirname(dst))
            )
            if ok:
                os.rename(local, dst)
            return self._json(200, {"boolean": ok})
        if op in ("SETPERMISSION", "SETOWNER", "SETTIMES", "SETREPLICATION"):
            if op == "SETREPLICATION":
                return self._json(200, {"boolean": True})
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        self._remote_exc(
            400, "UnsupportedOperationException",
            "java.lang.UnsupportedOperationException", f"PUT op {op}")

    def do_POST(self):
        local, q = self._parse()
        op = q.get("op", "").upper()
        if op == "APPEND":
            if q.get("data") != "true":
                return self._redirect_data()
            if not os.path.isfile(local):
                return self._not_found(local)
            body = self._read_body()
            with open(local, "ab") as f:
                f.write(body)
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        self._remote_exc(
            400, "UnsupportedOperationException",
            "java.lang.UnsupportedOperationException", f"POST op {op}")

    def do_DELETE(self):
        local, q = self._parse()
        op = q.get("op", "").upper()
        if op == "DELETE":
            if not os.path.exists(local):
                return self._json(200, {"boolean": False})
            recursive = q.get("recursive", "false").lower() == "true"
            if os.path.isdir(local):
                if os.listdir(local) and not recursive:
                    return self._remote_exc(
                        403, "PathIsNotEmptyDirectoryException",
                        "org.apache.hadoop.fs."
                        "PathIsNotEmptyDirectoryException",
                        f"{local} is non empty")
                shutil.rmtree(local)
            else:
                os.remove(local)
            return self._json(200, {"boolean": True})
        self._remote_exc(
            400, "UnsupportedOperationException",
            "java.lang.UnsupportedOperationException", f"DELETE op {op}")


class WebHdfsServer:
    """Threaded WebHDFS endpoint over ``root_dir``; use as a context
    manager or call :meth:`start`/:meth:`stop`. ``url`` is the
    ``webhdfs://host:port`` base the Hadoop client mounts."""

    def __init__(self, root_dir: str, host: str = "127.0.0.1", port: int = 0):
        self.root_dir = os.path.abspath(root_dir)
        os.makedirs(self.root_dir, exist_ok=True)
        handler = type("Handler", (_Handler,), {"root": self.root_dir})
        self._httpd = ThreadingHTTPServer((host, port), handler)
        self._thread: threading.Thread = None
        self.host = host
        self.port = self._httpd.server_address[1]
        self.url = f"webhdfs://{self.host}:{self.port}"

    def start(self) -> "WebHdfsServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=10)

    def __enter__(self) -> "WebHdfsServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
