"""t7 reader/importer tests.

A minimal Torch7 serializer (writer) lives here in the test: we craft .t7
bytes for a reference-shaped netG module tree carrying PyTorch weights, read
them back with the pure-Python reader, import into our pytrees, and assert
end-to-end forward parity against the equivalent PyTorch model — the parity
oracle the reference's published checkpoints would go through.
"""

import io
import struct

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from video_filler_tpu.checkpoint.t7 import (
    TorchObject,
    flatten_modules,
    import_generator,
    read_t7,
)
from video_filler_tpu.models import GeneratorSpec, build_generator


class T7Writer:
    def __init__(self):
        self.buf = io.BytesIO()
        self.next_idx = 1

    def _i32(self, v):
        self.buf.write(struct.pack("<i", int(v)))

    def _i64(self, v):
        self.buf.write(struct.pack("<q", int(v)))

    def _f64(self, v):
        self.buf.write(struct.pack("<d", float(v)))

    def _raw_str(self, s):
        b = s.encode()
        self._i32(len(b))
        self.buf.write(b)

    def number(self, v):
        self._i32(1)
        self._f64(v)

    def string(self, s):
        self._i32(2)
        self._raw_str(s)

    def boolean(self, v):
        self._i32(5)
        self._i32(1 if v else 0)

    def table(self, d):
        self._i32(3)
        self._i32(self.next_idx)
        self.next_idx += 1
        self._i32(len(d))
        for k, v in d.items():
            self.write(k)
            self.write(v)

    def storage(self, arr):
        self._i32(4)
        self._i32(self.next_idx)
        self.next_idx += 1
        self._raw_str("V 1")
        self._raw_str("torch.FloatStorage")
        flat = np.ascontiguousarray(arr, np.float32).ravel()
        self._i64(flat.size)
        self.buf.write(flat.tobytes())

    def tensor(self, arr):
        arr = np.ascontiguousarray(arr, np.float32)
        self._i32(4)
        self._i32(self.next_idx)
        self.next_idx += 1
        self._raw_str("V 1")
        self._raw_str("torch.FloatTensor")
        self._i32(arr.ndim)
        for s in arr.shape:
            self._i64(s)
        stride = 1
        strides = []
        for s in reversed(arr.shape):
            strides.append(stride)
            stride *= s
        for s in reversed(strides):
            self._i64(s)
        self._i64(1)  # storage offset (1-based)
        self.storage(arr)

    def torch_object(self, cls, fields):
        self._i32(4)
        self._i32(self.next_idx)
        self.next_idx += 1
        self._raw_str("V 1")
        self._raw_str(cls)
        self.table(fields)

    def write(self, v):
        if v is None:
            self._i32(0)
        elif isinstance(v, bool):
            self.boolean(v)
        elif isinstance(v, (int, float)):
            self.number(v)
        elif isinstance(v, str):
            self.string(v)
        elif isinstance(v, np.ndarray):
            self.tensor(v)
        elif isinstance(v, dict):
            self.table(v)
        elif isinstance(v, tuple):  # ('classname', fields)
            self.torch_object(v[0], v[1])
        else:
            raise TypeError(type(v))


def _seq(mods):
    return ("nn.Sequential",
            {"modules": {float(i + 1): m for i, m in enumerate(mods)}})


def _t7_conv(m: nn.Conv2d):
    return ("nn.SpatialConvolution", {
        "weight": m.weight.detach().numpy(),
        "nInputPlane": m.in_channels, "nOutputPlane": m.out_channels,
        "kH": m.kernel_size[0], "kW": m.kernel_size[1]})


def _t7_deconv(m: nn.ConvTranspose2d):
    return ("nn.SpatialFullConvolution", {
        "weight": m.weight.detach().numpy()})


def _t7_bn(m: nn.BatchNorm2d):
    return ("nn.SpatialBatchNormalization", {
        "weight": m.weight.detach().numpy(),
        "bias": m.bias.detach().numpy(),
        "running_mean": m.running_mean.numpy(),
        "running_var": m.running_var.numpy()})


def _build_torch_netg(nef=4, ngf=4, nb=8, nc=3, seed=0):
    torch.manual_seed(seed)
    conv = lambda i, o, k=4, s=2, p=1: nn.Conv2d(i, o, k, s, p, bias=False)
    deconv = lambda i, o, k=4, s=2, p=1: nn.ConvTranspose2d(i, o, k, s, p,
                                                            bias=False)
    enc = [conv(nc, nef), nn.LeakyReLU(0.2),
           conv(nef, nef), nn.BatchNorm2d(nef), nn.LeakyReLU(0.2),
           conv(nef, nef * 2), nn.BatchNorm2d(nef * 2), nn.LeakyReLU(0.2),
           conv(nef * 2, nef * 4), nn.BatchNorm2d(nef * 4), nn.LeakyReLU(0.2),
           conv(nef * 4, nef * 8), nn.BatchNorm2d(nef * 8), nn.LeakyReLU(0.2),
           conv(nef * 8, nb, 4, 1, 0)]
    mid = [nn.BatchNorm2d(nb), nn.LeakyReLU(0.2)]
    dec = [deconv(nb, ngf * 8, 4, 1, 0), nn.BatchNorm2d(ngf * 8), nn.ReLU(),
           deconv(ngf * 8, ngf * 4), nn.BatchNorm2d(ngf * 4), nn.ReLU(),
           deconv(ngf * 4, ngf * 2), nn.BatchNorm2d(ngf * 2), nn.ReLU(),
           deconv(ngf * 2, ngf), nn.BatchNorm2d(ngf), nn.ReLU(),
           deconv(ngf, nc), nn.Tanh()]
    model = nn.Sequential(*enc, *mid, *dec)
    # randomize BN stats so eval mode is a real test
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    model.eval()
    return model, enc, mid, dec


def _serialize_netg(enc, mid, dec) -> bytes:
    def conv_mods(mods):
        out = []
        for m in mods:
            if isinstance(m, nn.Conv2d):
                out.append(_t7_conv(m))
            elif isinstance(m, nn.ConvTranspose2d):
                out.append(_t7_deconv(m))
            elif isinstance(m, nn.BatchNorm2d):
                out.append(_t7_bn(m))
            elif isinstance(m, nn.LeakyReLU):
                out.append(("nn.LeakyReLU", {"negval": 0.2}))
            elif isinstance(m, nn.ReLU):
                out.append(("nn.ReLU", {}))
            elif isinstance(m, nn.Tanh):
                out.append(("nn.Tanh", {}))
        return out

    w = T7Writer()
    netg = _seq([_seq(conv_mods(enc))] + conv_mods(mid) + conv_mods(dec))
    w.write(netg)
    return w.buf.getvalue()


def test_reader_primitives(tmp_path):
    w = T7Writer()
    w.write({"a": 1.5, "b": "hi", "c": True,
             "t": np.arange(6, dtype=np.float32).reshape(2, 3)})
    p = tmp_path / "x.t7"
    p.write_bytes(w.buf.getvalue())
    obj = read_t7(str(p))
    assert obj["a"] == 1.5 and obj["b"] == "hi" and obj["c"] is True
    np.testing.assert_array_equal(obj["t"], [[0, 1, 2], [3, 4, 5]])


def test_flatten_and_import_forward_parity(tmp_path):
    model, enc, mid, dec = _build_torch_netg()
    p = tmp_path / "netg.t7"
    p.write_bytes(_serialize_netg(enc, mid, dec))

    obj = read_t7(str(p))
    mods = flatten_modules(obj)
    assert sum(m.torch_type == "nn.SpatialConvolution" for m in mods) == 6
    assert sum(m.torch_type == "nn.SpatialFullConvolution" for m in mods) == 5

    spec = GeneratorSpec(nc_in=3, nc_out=3, nef=4, ngf=4, n_bottleneck=8,
                         out_size=64, dtype="float32")
    params, state = import_generator(obj, spec)
    gen = build_generator(spec)

    rs = np.random.RandomState(0)
    x = rs.randn(2, 128, 128, 3).astype(np.float32)
    y_ours, _ = gen.apply(jax.tree.map(jnp.asarray, params),
                          jax.tree.map(jnp.asarray, state), jnp.asarray(x),
                          train=False)
    with torch.no_grad():
        y_ref = model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(y_ours),
                               y_ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=1e-4)


def test_import_generator_128_out(tmp_path):
    """128-out video-variant topology (extra ngf mid stage) imports too."""
    torch.manual_seed(1)
    nef = ngf = 4
    nb, nc = 8, 6  # nc*predLen=6 channel-folded
    conv = lambda i, o, k=4, s=2, p=1: nn.Conv2d(i, o, k, s, p, bias=False)
    deconv = lambda i, o, k=4, s=2, p=1: nn.ConvTranspose2d(i, o, k, s, p,
                                                            bias=False)
    enc = [conv(nc, nef), nn.LeakyReLU(0.2),
           conv(nef, nef), nn.BatchNorm2d(nef), nn.LeakyReLU(0.2),
           conv(nef, nef * 2), nn.BatchNorm2d(nef * 2), nn.LeakyReLU(0.2),
           conv(nef * 2, nef * 4), nn.BatchNorm2d(nef * 4), nn.LeakyReLU(0.2),
           conv(nef * 4, nef * 8), nn.BatchNorm2d(nef * 8), nn.LeakyReLU(0.2),
           conv(nef * 8, nb, 4, 1, 0)]
    mid = [nn.BatchNorm2d(nb), nn.LeakyReLU(0.2)]
    dec = [deconv(nb, ngf * 8, 4, 1, 0), nn.BatchNorm2d(ngf * 8), nn.ReLU(),
           deconv(ngf * 8, ngf * 4), nn.BatchNorm2d(ngf * 4), nn.ReLU(),
           deconv(ngf * 4, ngf * 2), nn.BatchNorm2d(ngf * 2), nn.ReLU(),
           deconv(ngf * 2, ngf), nn.BatchNorm2d(ngf), nn.ReLU(),
           deconv(ngf, ngf), nn.BatchNorm2d(ngf), nn.ReLU(),   # 128-out mid
           deconv(ngf, nc), nn.Tanh()]
    model = nn.Sequential(*enc, *mid, *dec)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    model.eval()
    p = tmp_path / "netg128.t7"
    p.write_bytes(_serialize_netg(enc, mid, dec))

    spec = GeneratorSpec(nc_in=nc, nc_out=nc, nef=nef, ngf=ngf,
                         n_bottleneck=nb, out_size=128, dtype="float32")
    params, state = import_generator(read_t7(str(p)), spec)
    gen = build_generator(spec)
    rs = np.random.RandomState(2)
    x = rs.randn(1, 128, 128, nc).astype(np.float32)
    y_ours, _ = gen.apply(jax.tree.map(jnp.asarray, params),
                          jax.tree.map(jnp.asarray, state), jnp.asarray(x),
                          train=False)
    with torch.no_grad():
        y_ref = model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(y_ours),
                               y_ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=1e-4)


def test_import_discriminator(tmp_path):
    from video_filler_tpu.checkpoint.t7 import import_discriminator
    from video_filler_tpu.models import DiscriminatorSpec, build_discriminator

    torch.manual_seed(2)
    ndf, nc = 8, 3
    conv = lambda i, o, k=4, s=2, p=1: nn.Conv2d(i, o, k, s, p, bias=False)
    mods = [conv(nc, ndf // 2), nn.LeakyReLU(0.2),        # 128-in head
            conv(ndf // 2, ndf), nn.LeakyReLU(0.2),
            conv(ndf, ndf * 2), nn.BatchNorm2d(ndf * 2), nn.LeakyReLU(0.2),
            conv(ndf * 2, ndf * 4), nn.BatchNorm2d(ndf * 4), nn.LeakyReLU(0.2),
            conv(ndf * 4, ndf * 8), nn.BatchNorm2d(ndf * 8), nn.LeakyReLU(0.2),
            conv(ndf * 8, 1, 4, 1, 0)]
    tmodel = nn.Sequential(*mods)
    for m in tmodel.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    tmodel.eval()

    w = T7Writer()
    t7_mods = []
    for m in mods:
        if isinstance(m, nn.Conv2d):
            t7_mods.append(_t7_conv(m))
        elif isinstance(m, nn.BatchNorm2d):
            t7_mods.append(_t7_bn(m))
        else:
            t7_mods.append(("nn.LeakyReLU", {}))
    t7_mods.append(("nn.Sigmoid", {}))
    t7_mods.append(("nn.View", {}))
    w.write(_seq(t7_mods))
    p = tmp_path / "netd.t7"
    p.write_bytes(w.buf.getvalue())

    spec = DiscriminatorSpec(nc_in=nc, ndf=ndf, in_size=128, dtype="float32")
    params, state = import_discriminator(str(p), spec)
    disc = build_discriminator(spec)
    rs = np.random.RandomState(3)
    x = rs.randn(2, 128, 128, nc).astype(np.float32)
    logits, _ = disc.apply(jax.tree.map(jnp.asarray, params),
                           jax.tree.map(jnp.asarray, state), jnp.asarray(x),
                           train=False)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).view(-1)
    np.testing.assert_allclose(np.asarray(logits), ref.numpy(), rtol=1e-3,
                               atol=1e-4)


def test_import_discriminator_64(tmp_path):
    """64-in D head (train.lua:181-199): single nc->ndf conv, no BN."""
    from video_filler_tpu.checkpoint.t7 import import_discriminator
    from video_filler_tpu.models import DiscriminatorSpec, build_discriminator

    torch.manual_seed(4)
    ndf, nc = 8, 3
    conv = lambda i, o, k=4, s=2, p=1: nn.Conv2d(i, o, k, s, p, bias=False)
    mods = [conv(nc, ndf), nn.LeakyReLU(0.2),
            conv(ndf, ndf * 2), nn.BatchNorm2d(ndf * 2), nn.LeakyReLU(0.2),
            conv(ndf * 2, ndf * 4), nn.BatchNorm2d(ndf * 4), nn.LeakyReLU(0.2),
            conv(ndf * 4, ndf * 8), nn.BatchNorm2d(ndf * 8), nn.LeakyReLU(0.2),
            conv(ndf * 8, 1, 4, 1, 0)]
    tmodel = nn.Sequential(*mods)
    for m in tmodel.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    tmodel.eval()

    w = T7Writer()
    t7_mods = []
    for m in mods:
        if isinstance(m, nn.Conv2d):
            t7_mods.append(_t7_conv(m))
        elif isinstance(m, nn.BatchNorm2d):
            t7_mods.append(_t7_bn(m))
        else:
            t7_mods.append(("nn.LeakyReLU", {}))
    w.write(_seq(t7_mods))
    p = tmp_path / "netd64.t7"
    p.write_bytes(w.buf.getvalue())

    spec = DiscriminatorSpec(nc_in=nc, ndf=ndf, in_size=64, dtype="float32")
    params, state = import_discriminator(str(p), spec)
    disc = build_discriminator(spec)
    rs = np.random.RandomState(5)
    x = rs.randn(2, 64, 64, nc).astype(np.float32)
    logits, _ = disc.apply(jax.tree.map(jnp.asarray, params),
                           jax.tree.map(jnp.asarray, state), jnp.asarray(x),
                           train=False)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).view(-1)
    np.testing.assert_allclose(np.asarray(logits), ref.numpy(), rtol=1e-3,
                               atol=1e-4)


class T7WriterExt(T7Writer):
    """Writer extensions for serialization corner cases."""

    def ref(self, idx):
        """Reference a previously-emitted object by memo index."""
        self._i32(4)
        self._i32(idx)

    def storage_typed(self, arr, cls, legacy=False):
        self._i32(4)
        idx = self.next_idx
        self.next_idx += 1
        self._i32(idx)
        if not legacy:
            self._raw_str("V 1")
        self._raw_str(cls)
        self._i64(arr.size)
        self.buf.write(np.ascontiguousarray(arr).tobytes())
        return idx

    def tensor_header(self, cls, shape, strides, offset1, legacy=False):
        self._i32(4)
        idx = self.next_idx
        self.next_idx += 1
        self._i32(idx)
        if not legacy:
            self._raw_str("V 1")
        self._raw_str(cls)
        self._i32(len(shape))
        for s in shape:
            self._i64(s)
        for s in strides:
            self._i64(s)
        self._i64(offset1)
        return idx


def test_reader_shared_storage(tmp_path):
    """Two tensors viewing ONE storage (torch shared-storage serialization):
    the second tensor's storage record is a memo reference."""
    w = T7WriterExt()
    data = np.arange(12, dtype=np.float32)
    # table {a: tensor over full storage, b: transposed view of the same}
    w._i32(3); w._i32(w.next_idx); w.next_idx += 1; w._i32(2)
    w.string("a")
    w.tensor_header("torch.FloatTensor", (3, 4), (4, 1), 1)
    sidx = w.storage_typed(data, "torch.FloatStorage")
    w.string("b")
    w.tensor_header("torch.FloatTensor", (4, 3), (1, 4), 1)  # transpose view
    w.ref(sidx)
    p = tmp_path / "shared.t7"
    p.write_bytes(w.buf.getvalue())
    obj = read_t7(str(p))
    np.testing.assert_array_equal(obj["a"], data.reshape(3, 4))
    np.testing.assert_array_equal(obj["b"], data.reshape(3, 4).T)


def test_reader_storage_offset_view(tmp_path):
    """1-based storage offset + narrow view (torch narrow/select)."""
    w = T7WriterExt()
    data = np.arange(10, dtype=np.float32)
    w.tensor_header("torch.FloatTensor", (2, 3), (3, 1), 3)  # offset 3 (1-based)
    w.storage_typed(data, "torch.FloatStorage")
    p = tmp_path / "off.t7"
    p.write_bytes(w.buf.getvalue())
    t = read_t7(str(p))
    np.testing.assert_array_equal(t, [[2, 3, 4], [5, 6, 7]])


def test_reader_char_and_byte_storages(tmp_path):
    """CharStorage (int8) and ByteStorage (uint8) tensors — the reference
    stores masks as ByteTensor (datavid/donkey_folder.lua:29-35)."""
    w = T7WriterExt()
    w._i32(3); w._i32(w.next_idx); w.next_idx += 1; w._i32(2)
    w.string("c")
    w.tensor_header("torch.CharTensor", (4,), (1,), 1)
    w.storage_typed(np.array([-3, -1, 0, 7], np.int8), "torch.CharStorage")
    w.string("y")
    w.tensor_header("torch.ByteTensor", (4,), (1,), 1)
    w.storage_typed(np.array([0, 1, 255, 128], np.uint8), "torch.ByteStorage")
    p = tmp_path / "cb.t7"
    p.write_bytes(w.buf.getvalue())
    obj = read_t7(str(p))
    np.testing.assert_array_equal(obj["c"], [-3, -1, 0, 7])
    assert obj["c"].dtype == np.int8
    np.testing.assert_array_equal(obj["y"], [0, 1, 255, 128])
    assert obj["y"].dtype == np.uint8


def test_reader_legacy_no_version_header(tmp_path):
    """Pre-'V 1' torch files write the classname where the version string
    would be (t7.py:123-127)."""
    w = T7WriterExt()
    w.tensor_header("torch.FloatTensor", (2, 2), (2, 1), 1, legacy=True)
    w.storage_typed(np.arange(4, dtype=np.float32), "torch.FloatStorage",
                    legacy=True)
    p = tmp_path / "legacy.t7"
    p.write_bytes(w.buf.getvalue())
    t = read_t7(str(p))
    np.testing.assert_array_equal(t, [[0, 1], [2, 3]])


def test_reader_shared_table_identity(tmp_path):
    """The same table referenced twice deserializes to ONE object."""
    w = T7WriterExt()
    w._i32(3); w._i32(w.next_idx); outer = w.next_idx; w.next_idx += 1
    w._i32(2)
    w.string("x")
    w._i32(3); w._i32(w.next_idx); inner = w.next_idx; w.next_idx += 1
    w._i32(1)
    w.string("k"); w.number(42.0)
    w.string("y")
    w._i32(3); w._i32(inner)  # memo reference to the inner table
    p = tmp_path / "sharedtab.t7"
    p.write_bytes(w.buf.getvalue())
    obj = read_t7(str(p))
    assert obj["x"] is obj["y"] and obj["x"]["k"] == 42.0


def test_reader_int_long_double_storages(tmp_path):
    w = T7WriterExt()
    w._i32(3); w._i32(w.next_idx); w.next_idx += 1; w._i32(3)
    w.string("i")
    w.tensor_header("torch.IntTensor", (3,), (1,), 1)
    w.storage_typed(np.array([1, -2, 3], np.int32), "torch.IntStorage")
    w.string("l")
    w.tensor_header("torch.LongTensor", (2,), (1,), 1)
    w.storage_typed(np.array([2**40, -5], np.int64), "torch.LongStorage")
    w.string("d")
    w.tensor_header("torch.DoubleTensor", (2,), (1,), 1)
    w.storage_typed(np.array([1.5, -0.25], np.float64), "torch.DoubleStorage")
    p = tmp_path / "ild.t7"
    p.write_bytes(w.buf.getvalue())
    obj = read_t7(str(p))
    np.testing.assert_array_equal(obj["i"], [1, -2, 3])
    np.testing.assert_array_equal(obj["l"], [2**40, -5])
    np.testing.assert_array_equal(obj["d"], [1.5, -0.25])


def test_load_generator_accepts_t7_directly(tmp_path):
    """eval CLIs take net=....t7: load_generator routes through the importer
    so a reference user's Torch7 checkpoint works unconverted."""
    from video_filler_tpu.config import Opt
    from video_filler_tpu.eval.common import load_generator

    model, enc, mid, dec = _build_torch_netg(seed=7)
    p = tmp_path / "ref_netg.t7"
    p.write_bytes(_serialize_netg(enc, mid, dec))

    opt = Opt(nef=4, ngf=4, nBottleneck=8, computeDtype="float32")
    forward, params, bn = load_generator(opt, "center", str(p))
    rs = np.random.RandomState(9)
    x = rs.randn(2, 128, 128, 3).astype(np.float32)
    y_ours = forward(params, bn, jnp.asarray(x))
    with torch.no_grad():
        y_ref = model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(y_ours),
                               y_ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=1e-4)


def test_export_generator_roundtrip(tmp_path):
    """t7 WRITER (util.save analogue): export our G as a reference-format
    netG .t7, read it back with the reader, import, and match the original
    forward exactly — two-way checkpoint exchange with Torch7."""
    from video_filler_tpu.checkpoint.t7 import export_generator

    spec = GeneratorSpec(nc_in=3, nc_out=3, nef=4, ngf=4, n_bottleneck=8,
                         out_size=64, dtype="float32")
    gen = build_generator(spec)
    params, state = gen.init(jax.random.PRNGKey(3))
    # make BN stats non-trivial so eval mode is a real test
    state = jax.tree.map(
        lambda x: x + 0.1 * jnp.arange(x.size, dtype=x.dtype) / x.size, state)

    p = tmp_path / "exported.t7"
    export_generator(params, state, spec, str(p))

    obj = read_t7(str(p))
    assert obj.torch_type == "nn.Sequential"
    mods = flatten_modules(obj)
    assert sum(m.torch_type == "nn.SpatialConvolution" for m in mods) == 6
    assert sum(m.torch_type == "nn.SpatialFullConvolution" for m in mods) == 5
    # conv hyperparams present (a real Torch7 nn needs them to :forward)
    c0 = next(m for m in mods if m.torch_type == "nn.SpatialConvolution")
    assert (c0["kW"], c0["dW"], c0["padW"]) == (4.0, 2.0, 1.0)

    p2, s2 = import_generator(obj, spec)
    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(2, 128, 128, 3).astype(np.float32))
    y0, _ = gen.apply(params, state, x, train=False)
    y1, _ = gen.apply(jax.tree.map(jnp.asarray, p2),
                      jax.tree.map(jnp.asarray, s2), x, train=False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-5, atol=1e-6)


def test_export_generator_128(tmp_path):
    from video_filler_tpu.checkpoint.t7 import export_generator

    spec = GeneratorSpec(nc_in=6, nc_out=6, nef=4, ngf=4, n_bottleneck=8,
                         out_size=128, dtype="float32")
    gen = build_generator(spec)
    params, state = gen.init(jax.random.PRNGKey(5))
    p = tmp_path / "exp128.t7"
    export_generator(params, state, spec, str(p))
    p2, s2 = import_generator(read_t7(str(p)), spec)
    x = jnp.asarray(np.random.RandomState(6)
                    .randn(1, 128, 128, 6).astype(np.float32))
    y0, _ = gen.apply(params, state, x, train=False)
    y1, _ = gen.apply(jax.tree.map(jnp.asarray, p2),
                      jax.tree.map(jnp.asarray, s2), x, train=False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-5, atol=1e-6)


def test_reader_cuda_typed_storages(tmp_path):
    """CudaTensor/CudaStorage-typed records: a checkpoint torch.save()d from
    a GPU net without :float() conversion serializes the identical wire
    format under cutorch class names (util.lua:72-81 clears buffers but not
    types).  The reader must map them to the matching host dtypes."""
    w = T7WriterExt()
    w._i32(3); w._i32(w.next_idx); w.next_idx += 1; w._i32(3)
    w.string("w")
    w.tensor_header("torch.CudaTensor", (2, 3), (3, 1), 1)
    data = np.arange(6, dtype=np.float32) * 0.5
    w.storage_typed(data, "torch.CudaStorage")
    w.string("idx")
    w.tensor_header("torch.CudaLongTensor", (2,), (1,), 1)
    w.storage_typed(np.array([7, 2**35], np.int64), "torch.CudaLongStorage")
    w.string("h")
    w.tensor_header("torch.CudaHalfTensor", (2,), (1,), 1)
    w.storage_typed(np.array([1.5, -0.25], np.float16),
                    "torch.CudaHalfStorage")
    p = tmp_path / "cuda.t7"
    p.write_bytes(w.buf.getvalue())
    obj = read_t7(str(p))
    np.testing.assert_array_equal(obj["w"], data.reshape(2, 3))
    assert obj["w"].dtype == np.float32
    np.testing.assert_array_equal(obj["idx"], [7, 2**35])
    np.testing.assert_array_equal(obj["h"], [1.5, -0.25])


def test_reader_shared_storage_across_modules(tmp_path):
    """One storage shared by the weight tensors of TWO nn modules (torch
    memoizes the storage record; the second tensor holds a memo ref) — e.g.
    tied weights.  Both module weights must read back as views of the same
    data, through the TorchObject path rather than a plain table."""
    w = T7WriterExt()
    data = np.arange(8, dtype=np.float32)

    def module(cls, ref_idx=None):
        w._i32(4); w._i32(w.next_idx); w.next_idx += 1
        w._raw_str("V 1"); w._raw_str(cls)
        w._i32(3); w._i32(w.next_idx); w.next_idx += 1; w._i32(1)
        w.string("weight")
        w.tensor_header("torch.FloatTensor", (2, 4), (4, 1), 1)
        if ref_idx is None:
            return w.storage_typed(data, "torch.FloatStorage")
        w.ref(ref_idx)
        return ref_idx

    # nn.Sequential{ modules = {1: Linear-ish A, 2: Linear-ish B} }
    w._i32(4); w._i32(w.next_idx); w.next_idx += 1
    w._raw_str("V 1"); w._raw_str("nn.Sequential")
    w._i32(3); w._i32(w.next_idx); w.next_idx += 1; w._i32(1)
    w.string("modules")
    w._i32(3); w._i32(w.next_idx); w.next_idx += 1; w._i32(2)
    w.number(1.0)
    sidx = module("nn.FuzzTiedA")
    w.number(2.0)
    module("nn.FuzzTiedB", ref_idx=sidx)
    p = tmp_path / "tied.t7"
    p.write_bytes(w.buf.getvalue())
    obj = read_t7(str(p))
    mods = flatten_modules(obj)
    assert [m.torch_type for m in mods] == ["nn.FuzzTiedA", "nn.FuzzTiedB"]
    np.testing.assert_array_equal(mods[0]["weight"], data.reshape(2, 4))
    np.testing.assert_array_equal(mods[1]["weight"], data.reshape(2, 4))


def test_reader_nested_concat_table_graph(tmp_path):
    """ConcatTable{ Sequential{ conv }, ConcatTable{ conv, conv } } — the
    nested-branch graph shape of conditionAdv-style D heads (train.lua:
    158-180 builds parallel context/pred towers).  flatten_modules must
    expand the nesting depth-first in numeric order."""
    w = T7WriterExt()

    def leaf(tag):
        w._i32(4); w._i32(w.next_idx); w.next_idx += 1
        w._raw_str("V 1"); w._raw_str("nn.FuzzLeaf")
        w._i32(3); w._i32(w.next_idx); w.next_idx += 1; w._i32(1)
        w.string("tag"); w.number(float(tag))

    def container(cls, n, body):
        w._i32(4); w._i32(w.next_idx); w.next_idx += 1
        w._raw_str("V 1"); w._raw_str(cls)
        w._i32(3); w._i32(w.next_idx); w.next_idx += 1; w._i32(1)
        w.string("modules")
        w._i32(3); w._i32(w.next_idx); w.next_idx += 1; w._i32(n)
        body()

    def outer_body():
        w.number(1.0)
        container("nn.Sequential", 1, lambda: (w.number(1.0), leaf(10)))
        w.number(2.0)
        container("nn.ConcatTable", 2,
                  lambda: (w.number(1.0), leaf(20),
                           w.number(2.0), leaf(21)))

    container("nn.ConcatTable", 2, outer_body)
    p = tmp_path / "concat.t7"
    p.write_bytes(w.buf.getvalue())
    obj = read_t7(str(p))
    assert obj.torch_type == "nn.ConcatTable"
    mods = flatten_modules(obj)
    assert [float(m["tag"]) for m in mods] == [10.0, 20.0, 21.0]


def test_reader_fuzz_random_trees(tmp_path):
    """Property fuzz: random nested Torch7 object trees (tables, numbers,
    strings, booleans, nil, tensors of random rank, torch objects) written
    by the oracle writer must read back structurally identical."""
    from video_filler_tpu.checkpoint.t7 import TorchObject, read_t7

    def gen(rs, depth):
        r = rs.rand()
        if depth >= 3 or r < 0.35:
            kind = rs.randint(5)
            if kind == 0:
                return float(np.round(rs.randn() * 100, 6))
            if kind == 1:
                return "s" + str(rs.randint(10**6))
            if kind == 2:
                return bool(rs.randint(2))
            if kind == 3:
                return None
            shape = tuple(rs.randint(1, 4) for _ in range(rs.randint(1, 5)))
            return rs.randn(*shape).astype(np.float32)
        n = rs.randint(0, 4)
        d = {f"k{i}": gen(rs, depth + 1) for i in range(n)}
        if r < 0.8:
            return d
        return ("obj", f"nn.Fuzz{rs.randint(5)}", d)

    def write(w, v):
        if isinstance(v, tuple) and v[0] == "obj":
            w.torch_object(v[1], v[2])
        elif isinstance(v, np.ndarray):
            w.tensor(v)
        elif isinstance(v, dict):
            w.table(v)
        else:
            w.write(v)

    def check(want, got, path="root"):
        if isinstance(want, tuple) and want[0] == "obj":
            assert isinstance(got, TorchObject), path
            assert got.torch_type == want[1], path
            check(want[2], got.fields, path + ".fields")
        elif isinstance(want, np.ndarray):
            np.testing.assert_array_equal(got, want, err_msg=path)
        elif isinstance(want, dict):
            assert isinstance(got, dict) and set(got) == set(want), path
            for k in want:
                check(want[k], got[k], f"{path}.{k}")
        elif want is None:
            assert got is None, path
        elif isinstance(want, bool):
            assert got is want, path
        elif isinstance(want, float):
            assert got == want, path
        else:
            assert got == want, path

    # patch T7Writer.table to route values through the fuzz writer
    class FuzzWriter(T7Writer):
        def table(self, d):
            self._i32(3)
            self._i32(self.next_idx)
            self.next_idx += 1
            self._i32(len(d))
            for k, v in d.items():
                self.write(k)
                write(self, v)

        def torch_object(self, cls, fields):
            self._i32(4)
            self._i32(self.next_idx)
            self.next_idx += 1
            self._raw_str("V 1")
            self._raw_str(cls)
            self.table(fields)

    for seed in range(30):
        rs = np.random.RandomState(seed)
        tree = {"root": gen(rs, 0)}
        w = FuzzWriter()
        w.table(tree)
        p = tmp_path / f"fuzz{seed}.t7"
        p.write_bytes(w.buf.getvalue())
        check(tree, read_t7(str(p)), f"seed{seed}")


# ---------------------------------------------------------------------------
# malformed-file hardening: the reader feeds file-supplied shape/stride/offset
# into as_strided — out-of-bounds headers must raise, never read host memory
# ---------------------------------------------------------------------------

def _raw_tensor_bytes(shape, stride, offset_1based, n_storage):
    w = T7Writer()
    w._i32(4)
    w._i32(w.next_idx)
    w.next_idx += 1
    w._raw_str("V 1")
    w._raw_str("torch.FloatTensor")
    w._i32(len(shape))
    for s in shape:
        w._i64(s)
    for s in stride:
        w._i64(s)
    w._i64(offset_1based)
    w.storage(np.zeros(n_storage, np.float32))
    return w.buf.getvalue()


def test_reader_rejects_oob_tensor(tmp_path):
    import pytest

    p = tmp_path / "bad.t7"
    # 4x4 tensor with stride (4,1) needs 16 elements; storage has 8
    p.write_bytes(_raw_tensor_bytes((4, 4), (4, 1), 1, 8))
    with pytest.raises(ValueError, match="exceeds its storage"):
        read_t7(str(p))
    # storage_offset 0 on the wire -> negative 0-based offset
    p.write_bytes(_raw_tensor_bytes((2, 2), (2, 1), 0, 4))
    with pytest.raises(ValueError, match="malformed t7 tensor header"):
        read_t7(str(p))
    # negative stride
    p.write_bytes(_raw_tensor_bytes((2, 2), (-2, 1), 1, 4))
    with pytest.raises(ValueError, match="malformed t7 tensor header"):
        read_t7(str(p))
    # huge offset
    p.write_bytes(_raw_tensor_bytes((2, 2), (2, 1), 10**9, 4))
    with pytest.raises(ValueError, match="exceeds its storage"):
        read_t7(str(p))


def test_reader_truncated_storage(tmp_path):
    import pytest

    full = _raw_tensor_bytes((2, 2), (2, 1), 1, 4)
    p = tmp_path / "trunc.t7"
    p.write_bytes(full[:-10])  # cut mid-storage
    with pytest.raises(EOFError):
        read_t7(str(p))


def test_import_spatial_convolution_mm(tmp_path):
    """nn.SpatialConvolutionMM serializes the flattened (out, in*kH*kW)
    weight; the importer must accept the class name and reshape it (common
    in older or :clearState()-converted Torch7 checkpoints)."""
    from video_filler_tpu.checkpoint.t7 import import_sequence

    rs = np.random.RandomState(0)
    w4 = rs.randn(8, 3, 4, 4).astype(np.float32)
    mm = ("nn.SpatialConvolutionMM",
          {"weight": w4.reshape(8, -1), "bias": np.zeros(8, np.float32),
           "kH": 4.0, "kW": 4.0, "nInputPlane": 3.0, "nOutputPlane": 8.0,
           "dH": 2.0, "dW": 2.0, "padH": 1.0, "padW": 1.0})
    wtr = T7Writer()
    wtr.write(_seq([mm]))
    p = tmp_path / "mm.t7"
    p.write_bytes(wtr.buf.getvalue())
    mods = flatten_modules(read_t7(str(p)))
    params, _ = import_sequence(mods, ["conv0"])
    np.testing.assert_array_equal(params["conv0"]["w"],
                                  w4.transpose(2, 3, 1, 0))
