#!/usr/bin/env python3
"""Generate fixture_aes.pdf — a genuine empty-user-password AES-128
encrypted PDF (standard security handler, V4/R4, /StdCF /CFM /AESV2),
the common Acrobat-7-era "permissions-only" protection (ISO 32000
§7.6.2).

Run from the repo root:  python3 tools/make_aes_fixture.py
Deterministic output (fixed IVs). Driver-side python only (hashlib MD5
+ the `cryptography` package's AES primitive); the Scala library
implements the decrypt side independently in extract/RealPdf.scala
(javax.crypto).

Layout mirrors fixture_rc4.pdf: one plain-AES content stream and one
AES-over-Flate stream (stored = AES(IV ‖ CBC(Flate(data))); readers
decrypt THEN inflate). Pins in RealPdfSpec: both lines extract,
proving the sAlT key extension, CBC/IV handling, PKCS#7 strip, and
decrypt-before-filter order.
"""
import hashlib, os, struct, zlib

from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E,
    0x56, 0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68,
    0x3E, 0x80, 0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A])


def rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray()
    x = y = 0
    for b in data:
        x = (x + 1) & 0xFF
        y = (y + s[x]) & 0xFF
        s[x], s[y] = s[y], s[x]
        out.append(b ^ s[(s[x] + s[y]) & 0xFF])
    return bytes(out)


N = 16          # 128-bit key
R = 4
V = 4
P = -3904
ID0 = bytes(range(0x50, 0x60))  # deterministic 16-byte file ID

# Algorithm 3: /O for empty owner password
h = hashlib.md5(PAD).digest()
for _ in range(50):
    h = hashlib.md5(h).digest()
key_o = h[:N]
O = rc4(key_o, PAD)
for i in range(1, 20):
    O = rc4(bytes(b ^ i for b in key_o), O)

# Algorithm 2: file key for the EMPTY user password (EncryptMetadata
# true -> no FFFFFFFF suffix)
md = hashlib.md5()
md.update(PAD)
md.update(O)
md.update(struct.pack("<i", P))
md.update(ID0)
h = md.digest()
for _ in range(50):
    h = hashlib.md5(h[:N]).digest()
FILE_KEY = h[:N]

# Algorithm 5 (R>=3): /U
U16 = rc4(FILE_KEY, hashlib.md5(PAD + ID0).digest())
for i in range(1, 20):
    U16 = rc4(bytes(b ^ i for b in FILE_KEY), U16)
U = U16 + b"\x00" * 16


def objkey(num: int, gen: int) -> bytes:
    d = hashlib.md5(FILE_KEY + struct.pack("<i", num)[:3]
                    + struct.pack("<i", gen)[:2]
                    + b"\x73\x41\x6c\x54").digest()
    return d[:min(N + 5, 16)]


def aes_enc(num: int, gen: int, data: bytes, iv: bytes) -> bytes:
    pad_len = 16 - (len(data) % 16)
    padded = data + bytes([pad_len]) * pad_len
    enc = Cipher(algorithms.AES(objkey(num, gen)),
                 modes.CBC(iv)).encryptor()
    return iv + enc.update(padded) + enc.finalize()


def hexstr(b: bytes) -> bytes:
    return b"<" + b.hex().upper().encode() + b">"


content1 = b"BT /F1 12 Tf 60 700 Td (aes plain stream) Tj ET"
content2_plain = b"BT /F1 12 Tf 60 680 Td (aes over flate) Tj ET"
enc1 = aes_enc(4, 0, content1, bytes(range(16)))
enc2 = aes_enc(5, 0, zlib.compress(content2_plain, 9),
               bytes(range(16, 32)))

objects = [
    (1, b"<< /Type /Catalog /Pages 2 0 R >>", None),
    (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
        b"/MediaBox [0 0 612 792] >>", None),
    (3, b"<< /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >>", None),
    (4, b"<< /Length %d >>" % len(enc1), enc1),
    (5, b"<< /Length %d /Filter /FlateDecode >>" % len(enc2), enc2),
    (6, b"<< /Filter /Standard /V %d /R %d /Length %d /P %d "
        b"/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen "
        b"/Length %d >> >> /StmF /StdCF /StrF /StdCF /O "
        % (V, R, N * 8, P, N) + hexstr(O) + b" /U " + hexstr(U)
        + b" >>", None),
]

out = bytearray(b"%PDF-1.6\n")
offsets = {}
for num, body, stream in objects:
    offsets[num] = len(out)
    out += b"%d 0 obj\n" % num + body
    if stream is not None:
        out += b"\nstream\n" + stream + b"\nendstream"
    out += b"\nendobj\n"
xref_at = len(out)
out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objects) + 1)
for num in sorted(offsets):
    out += b"%010d 00000 n \n" % offsets[num]
out += (b"trailer\n<< /Size %d /Root 1 0 R /Encrypt 6 0 R /ID ["
        % (len(objects) + 1) + hexstr(ID0) + b" " + hexstr(ID0)
        + b"] >>\nstartxref\n%d\n%%%%EOF\n" % xref_at)

path = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                    "resources", "fixture_aes.pdf")
with open(path, "wb") as f:
    f.write(bytes(out))
print(f"wrote {path} ({len(out)} bytes)")
