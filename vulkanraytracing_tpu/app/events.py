"""Typed event bus + input types.

Ref: Engine.hpp:34-42 — a std::any-keyed handler registry with
``TriggerEvent``/``AddEventHandler``; EventType enum from
EngineHelpers.hpp:7-14; key/action enums from InputHelpers.hpp.  Here the
bus is an instance (not static like the reference's service locator) so
multiple engines can coexist in one process.
"""

from __future__ import annotations

import enum
from collections import defaultdict
from typing import Any, Callable, NamedTuple


class EventType(enum.Enum):
    """Ref: EngineHelpers.hpp:7-14."""

    RESIZE = "resize"
    KEY_INPUT = "key_input"
    MOUSE_INPUT = "mouse_input"
    MOUSE_MOVE = "mouse_move"
    CAMERA_UPDATE = "camera_update"


class Key(enum.Enum):
    """The subset of InputHelpers.hpp keys the default bindings use
    (Config.hpp:57-65)."""

    W = "w"
    A = "a"
    S = "s"
    D = "d"
    SPACE = "space"
    LEFT_CONTROL = "lctrl"
    DIGIT_1 = "1"
    DIGIT_2 = "2"
    DIGIT_3 = "3"
    DIGIT_4 = "4"
    DIGIT_5 = "5"
    T = "t"  # render-mode toggle (Engine.cpp:222-245)
    R = "r"  # reload (reset accumulation analog)


class KeyAction(enum.Enum):
    PRESS = "press"
    RELEASE = "release"
    REPEAT = "repeat"


class KeyInput(NamedTuple):
    key: Key
    action: KeyAction


class EventBus:
    """TriggerEvent / AddEventHandler (Engine.hpp:92-109)."""

    def __init__(self) -> None:
        self._handlers: dict[EventType, list[Callable[[Any], None]]] = (
            defaultdict(list)
        )

    def add_handler(self, event: EventType, handler: Callable[[Any], None]) -> None:
        self._handlers[event].append(handler)

    def trigger(self, event: EventType, payload: Any = None) -> None:
        for handler in self._handlers[event]:
            handler(payload)
