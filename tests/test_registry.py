import pytest

from arrow_udf_spark import Registry, udf


def test_overloads_and_mangling():
    reg = Registry()

    @udf(input_types=["int", "int"], result_type="int", name="f", registry=reg)
    def f_int(a, b):
        return a

    @udf(input_types=["bigint", "bigint"], result_type="bigint", name="f", registry=reg)
    def f_big(a, b):
        return a

    assert reg.get("f").sig.arg_types == ("int", "int")
    assert reg.get("f", ("bigint", "bigint")).sig.mangled() == "f__bigint_bigint"
    with pytest.raises(KeyError):
        reg.get("f", ("string",))
    with pytest.raises(KeyError):
        reg.get("nope")


def test_variadic_match():
    reg = Registry()

    @udf(
        input_types=["string", "int"],
        result_type="string",
        name="v",
        variadic=True,
        registry=reg,
    )
    def v(s, *xs):
        return s

    assert reg.get("v", ("string", "int", "int", "int")).sig.name == "v"
    with pytest.raises(KeyError):
        reg.get("v", ("string", "int", "string"))


def test_global_corpus_registered():
    from arrow_udf_spark import GLOBAL
    import arrow_udf_spark.functions  # noqa: F401

    names = GLOBAL.names()
    for expected in ["gcd", "div", "series", "key_values", "sum_udaf", "weighted_avg"]:
        assert expected in names, expected
