"""Real ``aes:`` and ``secretsmanager:`` config providers
(distribution/main.go:16,18,41,43 parity) — AES-GCM pinned to the
FIPS-197 / NIST SP 800-38D vectors, SigV4 pinned to AWS's documented
signing example, and the provider wiring through spec resolution."""

import base64
import json

import pytest

from cardinalhq_otel_collector_ray.functions.aesgcm import (
    aes_encrypt_block, gcm_decrypt, gcm_encrypt)
from cardinalhq_otel_collector_ray.functions.sigv4 import sign
from cardinalhq_otel_collector_ray.pipelines.providers import (
    aes_encrypt_value, resolve_config, secretsmanager_provider)


def test_aes_block_fips197_vectors():
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    assert aes_encrypt_block(bytes(range(16)), pt).hex() == \
        "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert aes_encrypt_block(bytes(range(24)), pt).hex() == \
        "dda97ca4864cdfe06eaf70a0ec0d7191"
    assert aes_encrypt_block(bytes(range(32)), pt).hex() == \
        "8ea2b7ca516745bfeafc49904b496089"


def test_gcm_nist_vectors_and_tamper():
    k = b"\0" * 16
    iv = b"\0" * 12
    ct, tag = gcm_encrypt(k, iv, b"")
    assert tag.hex() == "58e2fccefa7e3061367f1d57a4e7455a"
    ct, tag = gcm_encrypt(k, iv, b"\0" * 16)
    assert ct.hex() == "0388dace60b6a392f328c2b971b2fe78"
    assert tag.hex() == "ab6e47d42cec13bdf53a67b21257bddf"
    # test case 4 (AES-128, AAD, 60-byte plaintext)
    k3 = bytes.fromhex("feffe9928665731c6d6a8f9467308308")
    iv3 = bytes.fromhex("cafebabefacedbaddecaf888")
    p3 = bytes.fromhex(
        "d9313225f88406e5a55909c5aff5269a86a7a9531534f7da2e4c303d8a318a72"
        "1c3c0c95956809532fcf0e2449a6b525b16aedf5aa0de657ba637b39")
    a3 = bytes.fromhex("feedfacedeadbeeffeedfacedeadbeefabaddad2")
    ct3, tag3 = gcm_encrypt(k3, iv3, p3, a3)
    assert tag3.hex() == "5bc94fbc3221a5db94fae95ae7121a47"
    assert gcm_decrypt(k3, iv3, ct3, tag3, a3) == p3
    # non-96-bit IV path (test case 6 IV length): tag per SP 800-38D
    iv6 = bytes.fromhex(
        "9313225df88406e555909c5aff5269aa6a7a9538534f7da1e4c303d2a318a728"
        "c3c0c95156809539fcf0e2429a6b525416aedbf5a0de6a57a637b39b")
    _, tag6 = gcm_encrypt(k3, iv6, p3, a3)
    assert tag6.hex() == "619cc5aefffe0bfa462af43c1699d050"
    # verify-then-decrypt: a flipped tag bit must raise
    bad = bytes([tag3[0] ^ 1]) + tag3[1:]
    with pytest.raises(ValueError, match="tag mismatch"):
        gcm_decrypt(k3, iv3, ct3, bad, a3)


def test_aes_provider_through_spec_resolution(monkeypatch):
    key_b64 = base64.b64encode(bytes(range(32))).decode()
    monkeypatch.setenv("CONFMAP_AES_KEY", key_b64)
    payload = aes_encrypt_value("s3cret-endpoint-token", key_b64,
                                nonce=bytes(12))
    spec = {"auth": {"token": "${aes:" + payload + "}"}}
    assert resolve_config(spec) == {"auth": {"token": "s3cret-endpoint-token"}}
    # wrong key → loud failure, not silent garbage
    monkeypatch.setenv("CONFMAP_AES_KEY",
                       base64.b64encode(bytes(32)).decode())
    with pytest.raises(Exception, match="tag mismatch"):
        resolve_config(spec)
    monkeypatch.delenv("CONFMAP_AES_KEY")
    with pytest.raises(Exception, match="CONFMAP_AES_KEY"):
        resolve_config(spec)


def test_sigv4_aws_documented_example():
    out = sign(
        "GET", "https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08",
        {"content-type": "application/x-www-form-urlencoded; charset=utf-8",
         "host": "iam.amazonaws.com", "x-amz-date": "20150830T123600Z"},
        b"", access_key="AKIDEXAMPLE",
        secret_key="wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
        region="us-east-1", service="iam", amz_date="20150830T123600Z")
    assert out["Authorization"].endswith(
        "Signature=5d672d79c15b13162d9279b0855cfba6"
        "789a8edb4c82c400e06b5924a6f2b5d7")
    assert "SignedHeaders=content-type;host;x-amz-date" in out["Authorization"]


def test_secretsmanager_provider_signed_request(monkeypatch):
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "AKIDEXAMPLE")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "k" * 40)
    monkeypatch.delenv("AWS_REGION", raising=False)
    monkeypatch.delenv("AWS_DEFAULT_REGION", raising=False)
    seen = {}

    def fake_transport(url, headers, body):
        seen["url"], seen["headers"], seen["body"] = url, headers, body
        return json.dumps({"SecretString": "hunter2"}).encode()

    arn = "arn:aws:secretsmanager:eu-west-1:123456789012:secret:db-pass"
    got = secretsmanager_provider(arn, transport=fake_transport)
    assert got == "hunter2"
    # region parsed from the ARN; target + SigV4 envelope present
    assert seen["url"] == "https://secretsmanager.eu-west-1.amazonaws.com/"
    assert seen["headers"]["x-amz-target"] == "secretsmanager.GetSecretValue"
    assert seen["headers"]["Authorization"].startswith(
        "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/")
    assert "/eu-west-1/secretsmanager/aws4_request" in \
        seen["headers"]["Authorization"]
    assert json.loads(seen["body"]) == {"SecretId": arn}
    # plain name selector needs AWS_REGION
    with pytest.raises(ValueError, match="region"):
        secretsmanager_provider("db-pass", transport=fake_transport)
    monkeypatch.setenv("AWS_REGION", "us-east-2")
    assert secretsmanager_provider("db-pass",
                                   transport=fake_transport) == "hunter2"
    assert seen["url"] == "https://secretsmanager.us-east-2.amazonaws.com/"
