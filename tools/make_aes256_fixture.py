#!/usr/bin/env python3
"""Generate fixture_aes256.pdf — a genuine empty-user-password AES-256
encrypted PDF (standard security handler V5/R6, /StdCF /CFM /AESV3),
the modern Acrobat-X+ default (ISO 32000-2 §7.6.4).

Run from the repo root:  python3 tools/make_aes256_fixture.py
Deterministic output (fixed salts/IVs/file key). Independent python
implementation (hashlib SHA-2 + the `cryptography` AES primitive); the
Scala decrypt side lives in extract/RealPdf.scala (hash2B + javax
.crypto).

Layout mirrors the other encrypted fixtures: one plain-AES stream and
one AES-over-Flate stream. Pins in RealPdfSpec: both lines extract,
proving the R6 2.B hash, /UE file-key unwrap, and the no-per-object-key
AESV3 rule.
"""
import hashlib, os, zlib

from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes


def aes_cbc_enc(key: bytes, iv: bytes, data: bytes) -> bytes:
    enc = Cipher(algorithms.AES(key), modes.CBC(iv)).encryptor()
    return enc.update(data) + enc.finalize()


def hash_2b(pw: bytes, salt: bytes, udata: bytes) -> bytes:
    """ISO 32000-2 Algorithm 2.B (R6)."""
    k = hashlib.sha256(pw + salt + udata).digest()
    i = 0
    while True:
        k1 = (pw + k + udata) * 64
        e = aes_cbc_enc(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256 if mod == 0 else
             hashlib.sha384 if mod == 1 else hashlib.sha512)(e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


FILE_KEY = bytes(range(32))         # deterministic 256-bit file key
V_SALT = bytes(range(0x10, 0x18))   # user validation salt
K_SALT = bytes(range(0x18, 0x20))   # user key salt

# /U = hash ‖ validation salt ‖ key salt (empty user password)
U = hash_2b(b"", V_SALT, b"") + V_SALT + K_SALT
# /UE = file key wrapped under the key-salt hash, AES-256-CBC, IV 0
UE = aes_cbc_enc(hash_2b(b"", K_SALT, b""), b"\x00" * 16, FILE_KEY)

# /O //OE for an empty owner password (owner hashes include U48)
OV_SALT = bytes(range(0x20, 0x28))
OK_SALT = bytes(range(0x28, 0x30))
O = hash_2b(b"", OV_SALT, U) + OV_SALT + OK_SALT
OE = aes_cbc_enc(hash_2b(b"", OK_SALT, U), b"\x00" * 16, FILE_KEY)

P = -3904
# /Perms: P (4LE) ‖ FFFFFFFF ‖ 'T' (EncryptMetadata) ‖ 'adb' ‖ 4 noise
perms_plain = (P & 0xFFFFFFFF).to_bytes(4, "little") + b"\xff\xff\xff\xff" \
    + b"Tadb" + bytes(4)
PERMS = aes_cbc_enc(FILE_KEY, b"\x00" * 16, perms_plain)  # ECB per spec;
# CBC with zero IV equals ECB for a single block


def aes_obj(data: bytes, iv: bytes) -> bytes:
    pad_len = 16 - (len(data) % 16)
    padded = data + bytes([pad_len]) * pad_len
    return iv + aes_cbc_enc(FILE_KEY, iv, padded)


def hexstr(b: bytes) -> bytes:
    return b"<" + b.hex().upper().encode() + b">"


content1 = b"BT /F1 12 Tf 60 700 Td (aes256 plain stream) Tj ET"
content2_plain = b"BT /F1 12 Tf 60 680 Td (aes256 over flate) Tj ET"
enc1 = aes_obj(content1, bytes(range(0x30, 0x40)))
enc2 = aes_obj(zlib.compress(content2_plain, 9), bytes(range(0x40, 0x50)))

objects = [
    (1, b"<< /Type /Catalog /Pages 2 0 R >>", None),
    (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
        b"/MediaBox [0 0 612 792] >>", None),
    (3, b"<< /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >>", None),
    (4, b"<< /Length %d >>" % len(enc1), enc1),
    (5, b"<< /Length %d /Filter /FlateDecode >>" % len(enc2), enc2),
    (6, b"<< /Filter /Standard /V 5 /R 6 /Length 256 /P %d "
        b"/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen "
        b"/Length 32 >> >> /StmF /StdCF /StrF /StdCF /O " % P
        + hexstr(O) + b" /OE " + hexstr(OE) + b" /U " + hexstr(U)
        + b" /UE " + hexstr(UE) + b" /Perms " + hexstr(PERMS)
        + b" >>", None),
]

ID0 = bytes(range(0x60, 0x70))
out = bytearray(b"%PDF-2.0\n")
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
                    "resources", "fixture_aes256.pdf")
with open(path, "wb") as f:
    f.write(bytes(out))
print(f"wrote {path} ({len(out)} bytes)")
