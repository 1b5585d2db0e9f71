"""Headless application loop.

The reference couples simulation stepping to a GLFW window's render loop
(mcl::Application::display, Application.cpp:69-172) with key controls:
SPACE toggles run_simulation, P single-steps, S dumps frames. This headless
equivalent drives the same loop shape without a window: fixed screen_dt
frames, per-frame sim->step + sim->update, optional PNG/OBJ dumps, and
programmatic "input events" delivered to registered callbacks (the stand-in
for Input's GLFW fan-out, Application.hpp:107-146).
"""

from __future__ import annotations

import os
from typing import Callable


class Application:
    def __init__(self, context, screen_dt: float = 1.0 / 30.0):
        self.context = context
        self.screen_dt = screen_dt
        self.run_simulation = True
        self.save_frames = False
        self.frame_dir = "frames"
        self.save_every = 1
        self.render_png = False
        #: called every frame after update: fn(app, frame_index)
        self.frame_callbacks: list[Callable] = []
        #: named event handlers (the key-callback analog): fn(app)
        self.event_handlers: dict[str, Callable] = {}
        self.frame = 0

    def on(self, event: str, handler: Callable):
        self.event_handlers[event] = handler
        return self

    def fire(self, event: str):
        """Deliver a programmatic input event (e.g. 'toggle_run', 'W')."""
        if event == "toggle_run":
            self.run_simulation = not self.run_simulation
        elif event == "single_step":
            self.context.step(self.screen_dt)
            self.context.update()
        elif event == "toggle_save":
            self.save_frames = not self.save_frames
        if event in self.event_handlers:
            self.event_handlers[event](self)
        return self

    def display(self, n_frames: int):
        """Run the loop for n_frames (the headless `while !shouldClose`)."""
        for _ in range(n_frames):
            if self.run_simulation:
                self.context.step(self.screen_dt)
            self.context.update()
            for cb in self.frame_callbacks:
                cb(self, self.frame)
            if self.save_frames and self.frame % self.save_every == 0:
                if self.render_png:
                    from .viz import render_frame

                    render_frame(
                        self.context.objects,
                        os.path.join(self.frame_dir, f"frame_{self.frame:05d}.png"),
                    )
                else:
                    self.context.export_obj(self.frame_dir, self.frame)
            self.frame += 1
        return self
