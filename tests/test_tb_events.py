"""TensorBoard event writer: TFRecord framing + proto encoding roundtrip."""

from pix2pixhdaudiosr_tpu.utils.tb_events import (EventWriter, crc32c,
                                                  read_events)


def test_crc32c_known_vectors():
    # RFC 3720 test vector: 32 bytes of zeros -> 0x8A9136AA
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"123456789") == 0xE3069283


def test_event_roundtrip(tmp_path):
    w = EventWriter(str(tmp_path))
    w.add_scalar("loss/G_GAN", 1.25, step=10)
    w.add_scalars({"loss/D_real": 0.5, "loss/D_fake": 0.25}, step=20)
    events = read_events(w.path)
    assert ("loss/G_GAN", 1.25, 10) in events
    assert ("loss/D_real", 0.5, 20) in events
    assert ("loss/D_fake", 0.25, 20) in events


def test_event_roundtrip_adversarial_wall_time(tmp_path):
    """Regression: wall_time is a fixed64 double (key 0x09) and must be
    skipped as 8 raw bytes. A mantissa byte equal to 0x10 or 0x2A used to be
    misparsed as a step/summary key (time-dependent flake — the reader
    checked 0x11 and byte-scanned through the double)."""
    import struct

    from pix2pixhdaudiosr_tpu.utils.tb_events import (_record, _scalar_event,
                                                      read_events)

    # a double whose little-endian bytes contain 0x10 and 0x2A
    evil = struct.unpack("<d", bytes([0x10, 0x2A, 0x10, 0x2A,
                                      0x10, 0x2A, 0xD0, 0x41]))[0]
    path = tmp_path / "evil.tfevents"
    with open(path, "wb") as f:
        f.write(_record(_scalar_event("loss/x", 2.5, step=7,
                                      wall_time=evil)))
        f.write(_record(_scalar_event("loss/y", -1.0, step=8,
                                      wall_time=evil)))
    events = read_events(str(path))
    assert ("loss/x", 2.5, 7) in events
    assert ("loss/y", -1.0, 8) in events
