"""Signed-token service auth (reference R8, cmd/server/main.go:34-98).

Wire-compatible with the reference's NaCl ``sign`` tokens:

- token payload = JSON ``{"e": expiry_unix, "u": "prefix,prefix",
  "p": base64(std) public key}`` (Go ``json.Marshal`` base64-encodes
  ``[]byte`` fields with std encoding);
- signed message = Ed25519 signature (64 bytes) || payload;
- ``Authorization`` header = raw-URL base64 of the signed message
  (Go ``base64.RawURLEncoding``).

Verification checks, in the reference's order (main.go:54-84):
decode, length, JSON parse, expiry, URL prefix, allowed public key,
signature.

Documented divergence: the reference's prefix check is inverted
(main.go:64-66 *rejects* when ``checkPrefixes`` matches, so a token
only works on paths it does NOT authorize). This implementation does
what the token semantics mean: the request path must start with one
of the token's comma-separated prefixes.

Backed by the ``cryptography`` package's Ed25519 (import-gated:
``signed_token_available()``).
"""

from __future__ import annotations

import base64
import json
import time
from dataclasses import dataclass

SIGN_OVERHEAD = 64  # Ed25519 signature bytes prepended by NaCl sign


def signed_token_available() -> bool:
    try:
        from cryptography.hazmat.primitives.asymmetric import ed25519  # noqa: F401

        return True
    except ImportError:
        return False


class AuthError(Exception):
    pass


@dataclass
class Token:
    expires_at: int  # unix seconds
    url_prefixes: str  # comma-separated allowed path prefixes
    public: bytes  # Ed25519 public key (32 bytes)

    def to_json(self) -> bytes:
        return json.dumps(
            {
                "e": self.expires_at,
                "u": self.url_prefixes,
                "p": base64.standard_b64encode(self.public).decode(),
            },
            separators=(",", ":"),
        ).encode()

    @classmethod
    def from_json(cls, payload: bytes) -> "Token":
        doc = json.loads(payload)
        return cls(
            expires_at=int(doc["e"]),
            url_prefixes=str(doc["u"]),
            public=base64.standard_b64decode(doc["p"]),
        )


def generate_keypair() -> tuple[bytes, object]:
    """(public_key_bytes, private_key_object)."""
    from cryptography.hazmat.primitives.asymmetric import ed25519

    priv = ed25519.Ed25519PrivateKey.generate()
    pub = priv.public_key().public_bytes_raw()
    return pub, priv


def sign_token(tok: Token, private_key) -> str:
    """signature || payload, raw-URL base64 (main.go:90-98)."""
    payload = tok.to_json()
    sig = private_key.sign(payload)
    return base64.urlsafe_b64encode(sig + payload).rstrip(b"=").decode()


def check_prefixes(path: str, prefixes: str) -> bool:
    return any(p and path.startswith(p) for p in prefixes.split(","))


def verify(auth_header: str, path: str, allowed: list[bytes]) -> Token:
    """Verify an Authorization header; returns the token or raises
    AuthError (reference verify(), main.go:54-84)."""
    from cryptography.exceptions import InvalidSignature
    from cryptography.hazmat.primitives.asymmetric import ed25519

    try:
        pad = "=" * (-len(auth_header) % 4)
        msg = base64.urlsafe_b64decode(auth_header + pad)
    except Exception as e:
        raise AuthError(f"bad encoding: {e}") from e
    if len(msg) < SIGN_OVERHEAD:
        raise AuthError("invalid auth len")
    sig, payload = msg[:SIGN_OVERHEAD], msg[SIGN_OVERHEAD:]
    try:
        tok = Token.from_json(payload)
    except Exception as e:
        raise AuthError(f"bad token payload: {e}") from e
    if time.time() > tok.expires_at:
        raise AuthError("token expired")
    if not check_prefixes(path, tok.url_prefixes):
        raise AuthError("invalid prefix")
    if not any(tok.public == pk for pk in allowed):
        raise AuthError("invalid pk")
    try:
        ed25519.Ed25519PublicKey.from_public_bytes(tok.public).verify(sig, payload)
    except InvalidSignature as e:
        raise AuthError("bad signature") from e
    return tok
