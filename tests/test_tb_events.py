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
