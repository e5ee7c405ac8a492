"""A minimal in-process Tk stand-in so RealtimeGCCNMFWindow's widget
wiring (toggle_play restart logic, spinbox/dropdown callbacks, keyboard
shortcuts, the close path) executes in the suite without a display.

Only the surface the window actually touches is implemented; widgets
record their construction options and expose ``invoke()``-style helpers so
tests can fire their callbacks the way Tk event dispatch would. The one
behavior this cannot cover is the literal ``mainloop()`` call.
"""

from __future__ import annotations

# geometry constants the window passes to pack()/Scale()
TOP, BOTTOM, LEFT, RIGHT = "top", "bottom", "left", "right"
X, Y, BOTH = "x", "y", "both"
HORIZONTAL, VERTICAL = "horizontal", "vertical"


class _Widget:
    def __init__(self, master=None, **options):
        self.master = master
        self.options = dict(options)
        self.children: list = []
        self.packed = False
        self.destroyed = False
        if master is not None:
            master.children.append(self)

    def pack(self, **_kw):
        self.packed = True

    def configure(self, **options):
        self.options.update(options)

    config = configure

    def cget(self, key):
        return self.options.get(key)

    def destroy(self):
        self.destroyed = True


class Frame(_Widget):
    pass


class Label(_Widget):
    pass


class Button(_Widget):
    def invoke(self):
        cmd = self.options.get("command")
        if cmd is not None:
            cmd()


class Checkbutton(_Widget):
    def invoke(self):
        var = self.options.get("variable")
        if var is not None:
            var.set(not var.get())
        cmd = self.options.get("command")
        if cmd is not None:
            cmd()


class Spinbox(_Widget):
    def set_and_fire(self, value):
        """Type/step a value and fire the command, like Tk's arrows do."""
        var = self.options.get("textvariable")
        if var is not None:
            var.set(value)
        cmd = self.options.get("command")
        if cmd is not None:
            cmd()


class Scale(_Widget):
    def __init__(self, master=None, **options):
        super().__init__(master, **options)
        self._value = options.get("from_", 0)

    def set(self, value):
        self._value = value

    def get(self):
        return self._value

    def drag_to(self, value):
        """Move the slider and fire the bound command (Tk passes the value
        as a string)."""
        self.set(value)
        cmd = self.options.get("command")
        if cmd is not None:
            cmd(str(value))


class OptionMenu(_Widget):
    def __init__(self, master, variable, *values, command=None, **options):
        super().__init__(master, **options)
        self.variable = variable
        self.values = values
        self.command = command

    def select(self, value):
        self.variable.set(value)
        if self.command is not None:
            self.command(value)


class _Variable:
    def __init__(self, value=None):
        self._value = value

    def get(self):
        return self._value

    def set(self, value):
        self._value = value


class BooleanVar(_Variable):
    def get(self):
        return bool(self._value)


class IntVar(_Variable):
    def get(self):
        return int(self._value)


class StringVar(_Variable):
    def get(self):
        return "" if self._value is None else str(self._value)


class Tk(_Widget):
    """Root window: records protocol handlers, key bindings, and after()
    timers so tests can fire them explicitly."""

    def __init__(self):
        super().__init__(None)
        self.titles: list[str] = []
        self.protocols: dict = {}
        self.bindings: dict = {}
        self.after_calls: list[tuple] = []
        self.mainloop_entered = 0

    def title(self, text):
        self.titles.append(text)

    def protocol(self, name, func):
        self.protocols[name] = func

    def bind(self, sequence, func):
        self.bindings[sequence] = func

    def after(self, ms, func):
        self.after_calls.append((ms, func))

    def run_after_callbacks(self):
        """Fire the queued after() callbacks once (one timer tick)."""
        pending, self.after_calls = self.after_calls, []
        for _ms, func in pending:
            func()

    def mainloop(self):
        self.mainloop_entered += 1  # do not block in tests


class FakeCanvasTkAgg:
    """Drop-in for FigureCanvasTkAgg built on the Agg renderer: real
    drawing and mpl event plumbing, stub Tk-widget surface."""

    def __new__(cls, figure, master=None):
        from matplotlib.backends.backend_agg import FigureCanvasAgg

        canvas = FigureCanvasAgg(figure)
        canvas.get_tk_widget = lambda: _Widget(master)
        return canvas
