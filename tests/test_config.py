"""Config shim parity: the reference's env-var coercion order (`tonumber(v)
or v` with 0/1 booleans, train.lua:35-39) and the key=value CLI built on it."""

import math

import pytest

from video_filler_tpu.config import Opt, _coerce, from_args, from_env


def test_coerce_semantics():
    # number first (train.lua:35): ints stay ints, floats stay floats
    assert _coerce("64", 32) == 64 and isinstance(_coerce("64", 32), int)
    assert _coerce("0.999", 0.0) == 0.999
    assert _coerce("2e-4", 2e-4) == 2e-4
    # 0/1 booleans (train.lua:37-39)
    assert _coerce("1", False) is True and _coerce("0", True) is False
    # strings pass through — including numeric-looking ones for str fields
    assert _coerce("maskppp.png", "") == "maskppp.png"
    assert _coerce("150", "") == "150"
    # negative loadSize modes survive coercion
    assert _coerce("-1", 350) == -1 and _coerce("-2", 350) == -2


def test_from_env_reference_names():
    env = {"batchSize": "21", "wtl2": "0.999", "overlapPred": "4",
           "manualSeed": "222", "maskName": "maskppp.png", "noiseGen": "1",
           "weight_nomask": "0.05", "UNRELATED_VAR": "ignored"}
    opt = from_env(environ=env)
    assert opt.batchSize == 21 and opt.overlapPred == 4
    assert opt.wtl2 == 0.999 and opt.weight_nomask == 0.05
    assert opt.manualSeed == 222 and opt.maskName == "maskppp.png"
    assert opt.noiseGen is True
    assert opt.ntrain == math.inf  # untouched defaults survive


def test_from_args_cli():
    opt = from_args(["batchSize=8", "predLen=4", "donkey_file=norandblk",
                     "computeDtype=float32"])
    assert opt.batchSize == 8 and opt.predLen == 4
    assert opt.noRandBlk is True
    assert opt.nc_total == 12  # nc * predLen (train_vid_weighted.lua:96)

    with pytest.raises(SystemExit, match="unknown option"):
        from_args(["btchSize=8"])
    with pytest.raises(SystemExit, match="key=value"):
        from_args(["video"])


def test_derived_channel_widths():
    opt = Opt(predLen=1)
    assert opt.nc_wholeim_in == 27    # nc * 3x3 array (wholeim:118)
    assert opt.nc_wholeim_out == 12   # nc * 2x2 out   (wholeim:119)


def test_fine_size_validation():
    with pytest.raises(ValueError, match="divisible by 4"):
        Opt(fineSize=130)


def test_coerce_bool_words_and_bad_values():
    """'conditionAdv=false' must DISABLE the flag (the reference's Lua
    coercion stored the truthy string — a footgun we refuse to replicate),
    and malformed bool/int values fail loudly with the key named."""
    opt = from_args(["conditionAdv=false", "display=off", "noiseGen=true",
                     "autoResume=False"])
    assert opt.conditionAdv is False and opt.display is False
    assert opt.noiseGen is True and opt.autoResume is False

    with pytest.raises(SystemExit, match="conditionAdv"):
        from_args(["conditionAdv=maybe"])
    with pytest.raises(SystemExit, match="batchSize"):
        from_args(["batchSize=nan"])
    with pytest.raises(SystemExit, match="niter"):
        from_args(["niter=inf"])
    with pytest.raises(SystemExit, match="batchSize"):
        from_args(["batchSize=2.5"])
    # float fields still take inf (ntrain's default IS math.inf)
    assert from_args(["ntrain=inf"]).ntrain == math.inf
    # env-var path reports the variable too
    with pytest.raises(SystemExit, match="env var display"):
        from_env(environ={"display": "wibble"})


def test_split_regime_shared_cli_helper():
    from video_filler_tpu.config import split_regime

    regime, rest = split_regime(["regime=video3d", "batchSize=4"])
    assert regime == "video3d" and rest == ["batchSize=4"]
    assert split_regime([], default="video")[0] == "video"
    with pytest.raises(SystemExit, match="unknown regime"):
        split_regime(["regime=vidoe3d"])  # typo caught, not a deep traceback
    with pytest.raises(SystemExit, match="key=value"):
        split_regime(["video"])
