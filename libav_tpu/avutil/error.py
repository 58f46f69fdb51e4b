"""Error codes (reference: libavutil/error.h:47-56).

libav uses negative errno values plus FourCC-tagged error codes returned from
every API call. Python-idiomatically we raise AVError; the send/receive codec
API additionally uses the sentinel returns AGAIN and EOF the same way libav
uses AVERROR(EAGAIN) / AVERROR_EOF (reference: libavcodec/avcodec.h:80-135),
because those two are control flow, not failures.
"""

import errno


def _fourcc_err(a: str, b: str, c: str, d: str) -> int:
    # reference: error.h MKTAG-based error space (negative FourCC)
    return -(ord(a) | (ord(b) << 8) | (ord(c) << 16) | (ord(d) << 24))


# Control-flow sentinels (match libav semantics, values are internal)
EAGAIN = -errno.EAGAIN
EOF_ = _fourcc_err('E', 'O', 'F', ' ')          # AVERROR_EOF  error.h:50
EINVAL = -errno.EINVAL
ENOMEM = -errno.ENOMEM
ENOSYS = -errno.ENOSYS

INVALIDDATA = _fourcc_err('I', 'N', 'D', 'A')    # AVERROR_INVALIDDATA error.h:56
BSF_NOT_FOUND = _fourcc_err(chr(0xF8), 'B', 'S', 'F')
DECODER_NOT_FOUND = _fourcc_err(chr(0xF8), 'D', 'E', 'C')
DEMUXER_NOT_FOUND = _fourcc_err(chr(0xF8), 'D', 'E', 'M')
ENCODER_NOT_FOUND = _fourcc_err(chr(0xF8), 'E', 'N', 'C')
MUXER_NOT_FOUND = _fourcc_err(chr(0xF8), 'M', 'U', 'X')
OPTION_NOT_FOUND = _fourcc_err(chr(0xF8), 'O', 'P', 'T')
PROTOCOL_NOT_FOUND = _fourcc_err(chr(0xF8), 'P', 'R', 'O')
STREAM_NOT_FOUND = _fourcc_err(chr(0xF8), 'S', 'T', 'R')
PATCHWELCOME = _fourcc_err('P', 'A', 'W', 'E')
BUG = _fourcc_err('B', 'U', 'G', '!')
EXIT = _fourcc_err('E', 'X', 'I', 'T')

_NAMES = {
    EOF_: "End of file",
    INVALIDDATA: "Invalid data found when processing input",
    DECODER_NOT_FOUND: "Decoder not found",
    DEMUXER_NOT_FOUND: "Demuxer not found",
    ENCODER_NOT_FOUND: "Encoder not found",
    MUXER_NOT_FOUND: "Muxer not found",
    OPTION_NOT_FOUND: "Option not found",
    PROTOCOL_NOT_FOUND: "Protocol not found",
    STREAM_NOT_FOUND: "Stream not found",
    PATCHWELCOME: "Not yet implemented, patches welcome",
    BUG: "Internal bug",
}


def err_str(code: int) -> str:
    """reference: error.c av_strerror"""
    if code in _NAMES:
        return _NAMES[code]
    try:
        return errno.errorcode.get(-code, "") and \
            __import__('os').strerror(-code) or f"error {code}"
    except (ValueError, OverflowError):
        return f"error {code}"


class AVError(Exception):
    """Raised for hard failures; carries the libav-compatible error code."""

    def __init__(self, code: int, msg: str = ""):
        self.code = code
        super().__init__(f"{err_str(code)}{': ' + msg if msg else ''}")
