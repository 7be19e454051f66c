"""Decorator utilities tests (reference common_utils/decorators parity)."""

import pytest

from stable_renderer_tpu.utils.decorators import (
    Overload,
    cache_property,
    class_property,
    prevent_re_init,
)
from stable_renderer_tpu.utils.registry import cross_module_singleton


def test_prevent_re_init():
    @prevent_re_init
    class A:
        def __init__(self):
            self.count = getattr(self, "count", 0) + 1

    a = A()
    A.__init__(a)
    assert a.count == 1


def test_class_property_and_cache_property():
    class B:
        _n = 41

        @class_property
        def n(cls):
            return cls._n + 1

        calls = 0

        @cache_property
        def expensive(self):
            type(self).calls += 1
            return 7

    assert B.n == 42
    b = B()
    assert b.expensive == 7 and b.expensive == 7
    assert B.calls == 1


def test_overload_dispatch():
    @Overload
    def f(x: int):
        return "int"

    @f.register
    def _(x: str):
        return "str"

    @f.register
    def _(x: int, y: int):
        return "two"

    assert f(1) == "int"
    assert f("a") == "str"
    assert f(1, 2) == "two"
    with pytest.raises(TypeError):
        f(1.5)


def test_overload_on_methods():
    class C:
        @Overload
        def g(self, x: int):
            return x + 1

        @g.register
        def _(self, x: str):
            return x.upper()

    c = C()
    assert c.g(1) == 2
    assert c.g("ab") == "AB"


def test_singleton():
    @cross_module_singleton
    class S:
        def __init__(self):
            self.v = 1

    a, b = S(), S()
    assert a is b
    assert S.instance() is a
    S._reset_singleton()
