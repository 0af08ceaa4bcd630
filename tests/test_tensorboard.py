"""TensorBoard event-writer: wire-format roundtrip + CRC integrity."""
import os
import struct

from hnd_ghnd_tpu.utils.tensorboard import (SummaryWriter, _masked_crc,
                                            read_scalars)


class TestWriter:
    def test_scalar_roundtrip(self, tmp_path):
        with SummaryWriter(str(tmp_path)) as w:
            w.add_scalar("train/loss", 1.5, 10)
            w.add_scalar("train/loss", 0.75, 20)
            w.add_scalar("val/map", 0.37, 1)
            path = w.path
        got = read_scalars(path)
        assert got == [("train/loss", 1.5, 10), ("train/loss", 0.75, 20),
                       ("val/map", 0.3700000047683716, 1)]

    def test_file_version_header_present(self, tmp_path):
        with SummaryWriter(str(tmp_path)) as w:
            path = w.path
        # first record must be the brain.Event:2 version event
        with open(path, "rb") as f:
            (n,) = struct.unpack("<Q", f.read(8))
            f.read(4)
            payload = f.read(n)
        assert b"brain.Event:2" in payload

    def test_crc_detects_corruption(self, tmp_path):
        with SummaryWriter(str(tmp_path)) as w:
            w.add_scalar("a", 1.0, 0)
            path = w.path
        data = bytearray(open(path, "rb").read())
        data[-6] ^= 0xFF  # flip a payload byte of the last record
        with open(path, "wb") as f:
            f.write(data)
        try:
            read_scalars(path)
            raised = False
        except ValueError:
            raised = True
        assert raised

    def test_noop_writer(self):
        w = SummaryWriter(None)
        w.add_scalar("x", 1.0, 0)  # must not raise
        w.flush()
        w.close()

    def test_crc_masking_reference_value(self):
        # spot-pin the masked crc32c so silent table regressions fail:
        # value computed with the canonical crc32c("123456789")=0xE3069283
        crc = 0xE3069283
        masked = (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF
        assert _masked_crc(b"123456789") == masked


class TestMimicRunnerFlag:
    def test_tb_dir_flag_exposed(self):
        from hnd_ghnd_tpu.runners.mimic_runner import get_argparser
        args = get_argparser().parse_args(
            ["--config", "x.yaml", "--tb_dir", "/tmp/tb"])
        assert args.tb_dir == "/tmp/tb"


class TestExtRunnerFlags:
    def test_tb_and_profile_flags_exposed(self):
        """ext_runner observability parity with mimic/coco runners
        (src/ext_runner.py has no such surface; ROC-AUC per epoch is the
        curve that drives its model selection)."""
        from hnd_ghnd_tpu.runners.ext_runner import get_argparser
        args = get_argparser().parse_args(
            ["--config", "x.yaml", "--tb_dir", "/tmp/tb",
             "--profile_dir", "/tmp/prof"])
        assert args.tb_dir == "/tmp/tb"
        assert args.profile_dir == "/tmp/prof"
