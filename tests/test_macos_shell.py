"""macOS shell arms driven through REAL ctypes against compiled C fakes.

The pattern that proved out for Windows (f3cf521's in-memory COM
vtables) and Apple Intelligence (C fake dylib with the Swift shim ABI):
compile a fake of the platform library at test time and drive the REAL
ctypes marshalling through it — argtypes bugs surface as crashes in
the test process, and the fake records the call sequence for
assertions.

Covered here:
  - libobjc fake -> MacBackend (NSPanel overlay) + MacTray
    (NSStatusItem): message sequences, runtime class registration, a
    REAL menu-action dispatch through the registered IMP.
  - CoreGraphics/CoreFoundation fake -> QuartzBackend: the CGEventTap
    callback is invoked from C with synthetic events; chord matching
    (press/release, modifiers via flagsChanged) is asserted end to end.
  - AudioToolbox fake -> MacMicSource: the AudioQueue input callback
    delivers PCM from C; samples must arrive through the ring at the
    AudioSource.read seam.
"""

import ctypes
import shutil
import subprocess
import sys

import numpy as np
import pytest

FAKE_C = r"""
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* ---------------- objc runtime fake ---------------- */

#define MAX_LOG 4096
static char log_sel[MAX_LOG][64];
static long long log_recv[MAX_LOG];
static long long log_arg1[MAX_LOG];
static int log_n = 0;

static char classes[256][64];
static int n_classes = 0;
static char sels[1024][64];
static int n_sels = 0;

static long long tags[4096];      /* receiver handle -> tag (setTag:) */
static long long next_obj = 1000;

/* menuAction: IMP registered via class_addMethod */
static void *registered_imp = 0;

void *objc_getClass(const char *name) {
    for (int i = 0; i < n_classes; i++)
        if (!strcmp(classes[i], name)) return (void *)(long long)(i + 1);
    strncpy(classes[n_classes], name, 63);
    n_classes++;
    return (void *)(long long)n_classes;
}

void *sel_registerName(const char *name) {
    for (int i = 0; i < n_sels; i++)
        if (!strcmp(sels[i], name)) return (void *)(long long)(i + 1 + 500);
    strncpy(sels[n_sels], name, 63);
    n_sels++;
    return (void *)(long long)(n_sels + 500);
}

static const char *sel_name(void *sel) {
    long long i = (long long)sel - 501;
    return (i >= 0 && i < n_sels) ? sels[i] : "?";
}

void *objc_msgSend(void *self, void *sel, void *p1, void *p2, void *p3,
                   void *p4) {
    const char *name = sel_name(sel);
    if (log_n < MAX_LOG) {
        strncpy(log_sel[log_n], name, 63);
        log_recv[log_n] = (long long)self;
        log_arg1[log_n] = (long long)p1;
        log_n++;
    }
    if (!strcmp(name, "setTag:")) {
        tags[((long long)self) % 4096] = (long long)p1;
        return 0;
    }
    if (!strcmp(name, "tag"))
        return (void *)tags[((long long)self) % 4096];
    return (void *)(++next_obj);
}

void *objc_allocateClassPair(void *super, const char *name, size_t extra) {
    (void)super; (void)extra;
    return objc_getClass(name);
}

int class_addMethod(void *cls, void *sel, void *imp, const char *types) {
    (void)cls; (void)types;
    if (!strcmp(sel_name(sel), "menuAction:")) registered_imp = imp;
    return 1;
}

void objc_registerClassPair(void *cls) { (void)cls; }

int fake_log_count(void) { return log_n; }
const char *fake_log_sel(int i) { return log_sel[i]; }
long long fake_log_arg1(int i) { return log_arg1[i]; }
void fake_log_reset(void) { log_n = 0; }

/* fire the registered menuAction: IMP with a sender that has a tag */
void fake_click_menu_item(long long tag) {
    long long sender = 3999;
    tags[sender % 4096] = tag;
    if (registered_imp)
        ((void (*)(void *, void *, void *))registered_imp)(
            0, 0, (void *)sender);
}

/* ---------------- CGEventTap / CFRunLoop fake ---------------- */

typedef void *(*tap_cb)(void *, uint32_t, void *, void *);
static tap_cb tap_callback = 0;
static uint64_t tap_mask = 0;
static uint32_t tap_options = 99;
static int64_t ev_keycode = 0;
static uint64_t ev_flags = 0;
static volatile int runloop_running = 0;
static int tap_enabled = 0;

void *CGEventTapCreate(uint32_t tap, uint32_t place, uint32_t options,
                       uint64_t mask, tap_cb cb, void *refcon) {
    (void)tap; (void)place; (void)refcon;
    tap_options = options;
    tap_mask = mask;
    tap_callback = cb;
    return (void *)0xTAPHANDLE;
}

int64_t CGEventGetIntegerValueField(void *event, uint32_t field) {
    (void)event; (void)field;
    return ev_keycode;
}

uint64_t CGEventGetFlags(void *event) { (void)event; return ev_flags; }

void CGEventTapEnable(void *tap, int enable) {
    (void)tap; tap_enabled = enable;
}

void *CFMachPortCreateRunLoopSource(void *alloc, void *port, long order) {
    (void)alloc; (void)port; (void)order;
    return (void *)0x5;
}

void *CFRunLoopGetCurrent(void) { return (void *)0x6; }
void CFRunLoopAddSource(void *rl, void *src, void *mode) {
    (void)rl; (void)src; (void)mode;
}

void CFRunLoopRun(void) {
    runloop_running = 1;
    while (runloop_running) { /* spin-wait; test stops quickly */ }
}

void CFRunLoopStop(void *rl) { (void)rl; runloop_running = 0; }

uint64_t fake_tap_mask(void) { return tap_mask; }
uint32_t fake_tap_options(void) { return tap_options; }
int fake_tap_enabled(void) { return tap_enabled; }

void fake_fire_event(uint32_t etype, int64_t keycode, uint64_t flags) {
    ev_keycode = keycode;
    ev_flags = flags;
    if (tap_callback) tap_callback((void *)0x1, etype, (void *)0x2, 0);
}

/* ---------------- AudioQueue fake ---------------- */

typedef struct AQBuffer {
    uint32_t mAudioDataBytesCapacity;
    void *mAudioData;
    uint32_t mAudioDataByteSize;
    void *mUserData;
    uint32_t mPacketDescriptionCapacity;
    void *mPacketDescriptions;
    uint32_t mPacketDescriptionCount;
} AQBuffer;

typedef void (*aq_cb)(void *, void *, AQBuffer *, void *, uint32_t, void *);
static aq_cb aq_callback = 0;
static AQBuffer *aq_bufs[8];
static int aq_n_bufs = 0;
static int aq_enqueued = 0;
static int aq_started = 0;
static double aq_rate = 0;
static uint32_t aq_format = 0, aq_channels = 0, aq_bits = 0;

typedef struct {
    double mSampleRate;
    uint32_t mFormatID, mFormatFlags, mBytesPerPacket, mFramesPerPacket,
        mBytesPerFrame, mChannelsPerFrame, mBitsPerChannel, mReserved;
} ASBD;

int32_t AudioQueueNewInput(ASBD *fmt, aq_cb cb, void *user, void *rl,
                           void *mode, uint32_t flags, void **out) {
    (void)user; (void)rl; (void)mode; (void)flags;
    aq_rate = fmt->mSampleRate;
    aq_format = fmt->mFormatID;
    aq_channels = fmt->mChannelsPerFrame;
    aq_bits = fmt->mBitsPerChannel;
    aq_callback = cb;
    *out = (void *)0xAA;
    return 0;
}

int32_t AudioQueueAllocateBuffer(void *q, uint32_t nbytes, AQBuffer **out) {
    (void)q;
    AQBuffer *b = (AQBuffer *)calloc(1, sizeof(AQBuffer));
    b->mAudioDataBytesCapacity = nbytes;
    b->mAudioData = malloc(nbytes);
    aq_bufs[aq_n_bufs++] = b;
    *out = b;
    return 0;
}

int32_t AudioQueueEnqueueBuffer(void *q, AQBuffer *b, uint32_t n, void *d) {
    (void)q; (void)b; (void)n; (void)d;
    aq_enqueued++;
    return 0;
}

int32_t AudioQueueStart(void *q, void *ts) {
    (void)q; (void)ts; aq_started = 1; return 0;
}
int32_t AudioQueueStop(void *q, int now) {
    (void)q; (void)now; aq_started = 0; return 0;
}
int32_t AudioQueueDispose(void *q, int now) { (void)q; (void)now; return 0; }

double fake_aq_rate(void) { return aq_rate; }
uint32_t fake_aq_format(void) { return aq_format; }
uint32_t fake_aq_channels(void) { return aq_channels; }
uint32_t fake_aq_bits(void) { return aq_bits; }
int fake_aq_enqueued(void) { return aq_enqueued; }
int fake_aq_started(void) { return aq_started; }

void fake_aq_feed(const float *samples, int n) {
    if (!aq_callback || aq_n_bufs == 0) return;
    AQBuffer *b = aq_bufs[0];
    uint32_t nbytes = (uint32_t)(n * 4);
    if (nbytes > b->mAudioDataBytesCapacity)
        nbytes = b->mAudioDataBytesCapacity;
    memcpy(b->mAudioData, samples, nbytes);
    b->mAudioDataByteSize = nbytes;
    aq_callback(0, (void *)0xAA, b, 0, (uint32_t)n, 0);
}
"""

FAKE_C = FAKE_C.replace("0xTAPHANDLE", "0x7")


@pytest.fixture(scope="module")
def fake_lib(tmp_path_factory):
    cc = shutil.which("cc") or shutil.which("gcc")
    if cc is None:
        pytest.skip("no C compiler in image")
    d = tmp_path_factory.mktemp("macos_shell")
    src = d / "fake_macos.c"
    src.write_text(FAKE_C)
    ext = ".dylib" if sys.platform == "darwin" else ".so"
    out = d / ("libfake_macos" + ext)
    subprocess.run(
        [cc, "-shared", "-fPIC", "-O1", "-o", str(out), str(src)],
        check=True,
    )
    lib = ctypes.CDLL(str(out))
    lib.fake_log_sel.restype = ctypes.c_char_p
    lib.fake_log_arg1.restype = ctypes.c_longlong
    lib.fake_tap_mask.restype = ctypes.c_uint64
    lib.fake_aq_rate.restype = ctypes.c_double
    lib.fake_fire_event.argtypes = [
        ctypes.c_uint32, ctypes.c_int64, ctypes.c_uint64,
    ]
    lib.fake_aq_feed.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.fake_click_menu_item.argtypes = [ctypes.c_longlong]
    return lib


@pytest.fixture
def runtime(fake_lib):
    from spittle_tpu.shell.macos_cocoa import ObjCRuntime

    fake_lib.fake_log_reset()
    return ObjCRuntime(fake_lib)


def _sels(lib):
    return [
        lib.fake_log_sel(i).decode()
        for i in range(lib.fake_log_count())
    ]


# ---------------- NSPanel overlay backend ----------------


class TestMacOverlay:
    def test_create_window_message_sequence(self, runtime, fake_lib):
        from spittle_tpu.shell.macos_overlay import (
            NS_NONACTIVATING_PANEL, NS_STATUS_WINDOW_LEVEL, MacBackend,
        )

        b = MacBackend(runtime, screen=(1920, 1080))
        assert b.open()
        b.create_window(874, 20, 172, 36, 0xDC2626)
        sels = _sels(fake_lib)
        assert "initWithContentRect:styleMask:backing:defer:" in sels
        assert "setLevel:" in sels
        assert "setIgnoresMouseEvents:" in sels
        assert "setCollectionBehavior:" in sels
        assert "orderFrontRegardless" not in sels  # not mapped yet
        # Style mask carried the nonactivating-panel bit; level is the
        # status-window level (overlay.rs:23-31 parity).
        i = sels.index("setLevel:")
        assert fake_lib.fake_log_arg1(i) == NS_STATUS_WINDOW_LEVEL

    def test_map_unmap_and_bars(self, runtime, fake_lib):
        from spittle_tpu.shell.macos_overlay import MacBackend

        b = MacBackend(runtime, screen=(1920, 1080))
        b.create_window(874, 20, 172, 36, 0xDC2626)
        fake_lib.fake_log_reset()
        b.map()
        b.fill_rect(0xFFFFFF, 2, 4, 6, 10)
        b.fill_rect(0xFFFFFF, 2, 4, 6, 20)  # same slot: reframed
        b.unmap()
        sels = _sels(fake_lib)
        assert sels[0] == "orderFrontRegardless"
        assert "initWithFrame:" in sels         # first bar creates a view
        assert "setFrame:" in sels              # second call reframes it
        assert sels.count("initWithFrame:") == 1
        assert "orderOut:" in sels
        assert len(b._bars) == 1

    def test_set_background_drops_bars(self, runtime, fake_lib):
        from spittle_tpu.shell.macos_overlay import MacBackend

        b = MacBackend(runtime, screen=(1920, 1080))
        b.create_window(874, 20, 172, 36, 0xDC2626)
        b.fill_rect(0xFFFFFF, 2, 4, 6, 10)
        fake_lib.fake_log_reset()
        b.set_background(0x2563EB)
        assert "removeFromSuperview" in _sels(fake_lib)
        assert not b._bars

    def test_controller_drives_backend(self, runtime, fake_lib, tmp_path):
        """The shared X11Overlay controller over the mac backend: a
        show event must configure + order front the panel."""
        from spittle_tpu.app.services import AppServices
        from spittle_tpu.shell.macos_overlay import MacBackend
        from spittle_tpu.shell.x11_overlay import X11Overlay

        from spittle_tpu.config.settings import OverlayPosition

        services = AppServices(str(tmp_path), use_mock_engine=True)
        services.update_settings(overlay_position=OverlayPosition("bottom"))
        backend = MacBackend(runtime, screen=(1280, 800))
        ov = X11Overlay(
            services.events, services.get_settings, backend=backend
        )
        assert ov.active
        from spittle_tpu.events import HIDE_OVERLAY, SHOW_OVERLAY

        services.events.emit(SHOW_OVERLAY, "recording")
        services.events.emit(HIDE_OVERLAY, None)
        import time

        time.sleep(0.2)  # let the overlay thread drain the queue
        ov.close()
        ov._thread.join(timeout=5)
        sels = _sels(fake_lib)
        assert "orderFrontRegardless" in sels
        assert "orderOut:" in sels


# ---------------- NSStatusItem tray ----------------


class TestMacTray:
    def _tray(self, runtime, clicked):
        from spittle_tpu.shell.macos_tray import MacTray

        return MacTray(
            [("settings", "Settings"), ("cancel", "Cancel"),
             ("quit", "Quit")],
            on_menu=clicked.append,
            runtime=runtime,
        )

    def test_builds_status_item_with_menu(self, runtime, fake_lib):
        clicked = []
        self._tray(runtime, clicked)
        sels = _sels(fake_lib)
        assert "statusItemWithLength:" in sels
        assert "setMenu:" in sels
        assert sels.count("initWithTitle:action:keyEquivalent:") == 3
        assert sels.count("setTarget:") == 3

    def test_menu_action_dispatches_through_real_imp(self, runtime,
                                                     fake_lib):
        """C calls the registered IMP (a ctypes thunk) with a tagged
        sender; the tray must resolve the tag to the item id."""
        clicked = []
        self._tray(runtime, clicked)
        fake_lib.fake_click_menu_item(1)
        fake_lib.fake_click_menu_item(2)
        assert clicked == ["cancel", "quit"]

    def test_set_state_updates_title(self, runtime, fake_lib):
        from spittle_tpu.app.ui_state import TrayIconState

        clicked = []
        tray = self._tray(runtime, clicked)
        fake_lib.fake_log_reset()
        tray.set_state(TrayIconState.RECORDING)
        sels = _sels(fake_lib)
        assert "setTitle:" in sels
        tray.close()
        assert "removeStatusItem:" in _sels(fake_lib)


# ---------------- CGEventTap hotkeys ----------------


class TestQuartzHotkeys:
    @pytest.fixture
    def backend(self, fake_lib):
        from spittle_tpu.shell.macos_keys import QuartzBackend

        b = QuartzBackend(cg=fake_lib, cf=fake_lib)
        yield b
        b.close()

    def test_tap_created_listen_only_with_mask(self, backend, fake_lib):
        from spittle_tpu.shell.macos_keys import EVENT_MASK, LISTEN_ONLY

        fired = []
        assert backend.register("ctrl+space", lambda hk, p: fired.append(p))
        assert fake_lib.fake_tap_mask() == EVENT_MASK
        assert fake_lib.fake_tap_options() == LISTEN_ONLY
        assert fake_lib.fake_tap_enabled() == 1

    def test_chord_press_release(self, backend, fake_lib):
        from spittle_tpu.shell.macos_keys import (
            FLAGS_CHANGED, KEY_DOWN, KEY_UP,
        )

        fired = []
        backend.register("ctrl+space", lambda hk, p: fired.append((hk, p)))
        # ctrl down (flagsChanged with control bit), space down/up.
        fake_lib.fake_fire_event(FLAGS_CHANGED, 59, 1 << 18)
        fake_lib.fake_fire_event(KEY_DOWN, 49, 1 << 18)
        fake_lib.fake_fire_event(KEY_UP, 49, 1 << 18)
        fake_lib.fake_fire_event(FLAGS_CHANGED, 59, 0)
        assert fired == [("ctrl+space", True), ("ctrl+space", False)]

    def test_most_specific_chord_wins(self, backend, fake_lib):
        from spittle_tpu.shell.macos_keys import FLAGS_CHANGED, KEY_DOWN

        fired = []
        backend.register("ctrl+space", lambda hk, p: fired.append((hk, p)))
        backend.register(
            "ctrl+shift+space", lambda hk, p: fired.append((hk, p))
        )
        fake_lib.fake_fire_event(FLAGS_CHANGED, 59, 1 << 18)
        fake_lib.fake_fire_event(FLAGS_CHANGED, 56, (1 << 18) | (1 << 17))
        fake_lib.fake_fire_event(KEY_DOWN, 49, (1 << 18) | (1 << 17))
        assert fired == [("ctrl+shift+space", True)]

    def test_capture_mode_streams_keys(self, backend, fake_lib):
        from spittle_tpu.shell.macos_keys import FLAGS_CHANGED, KEY_DOWN

        seen = []
        backend.start_capture(lambda k, p, mods: seen.append((k, p, mods)))
        fake_lib.fake_fire_event(FLAGS_CHANGED, 55, 1 << 20)  # cmd down
        fake_lib.fake_fire_event(KEY_DOWN, 0, 1 << 20)        # 'a'
        assert ("super", True, ["super"]) in seen
        assert ("a", True, ["a", "super"]) in seen

    def test_runloop_stops_on_close(self, fake_lib):
        from spittle_tpu.shell.macos_keys import QuartzBackend

        b = QuartzBackend(cg=fake_lib, cf=fake_lib)
        assert b.register("ctrl+space", lambda hk, p: None)
        import time

        time.sleep(0.05)  # let the runloop thread enter CFRunLoopRun
        b.close()  # must CFRunLoopStop and join without hanging


# ---------------- AudioQueue mic ----------------


class TestMacMic:
    def test_format_and_lifecycle(self, fake_lib):
        from spittle_tpu.shell.macos_mic import FORMAT_LPCM, MacMicSource

        src = MacMicSource(lib=fake_lib)
        assert fake_lib.fake_aq_rate() == 16000.0
        assert fake_lib.fake_aq_format() == FORMAT_LPCM
        assert fake_lib.fake_aq_channels() == 1
        assert fake_lib.fake_aq_bits() == 32
        assert fake_lib.fake_aq_started() == 1
        assert fake_lib.fake_aq_enqueued() >= 3
        src.close()
        assert fake_lib.fake_aq_started() == 0

    def test_pcm_flows_from_hal_callback_to_read(self, fake_lib):
        from spittle_tpu.shell.macos_mic import MacMicSource

        src = MacMicSource(lib=fake_lib)
        before = fake_lib.fake_aq_enqueued()
        pcm = (np.sin(np.arange(256) / 10.0) * 0.5).astype(np.float32)
        fake_lib.fake_aq_feed(
            pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(pcm)
        )
        got = src.read(timeout=1.0)
        assert got is not None and len(got) == 256
        np.testing.assert_allclose(got, pcm, rtol=0, atol=1e-7)
        # The buffer was re-enqueued for the next HAL delivery.
        assert fake_lib.fake_aq_enqueued() == before + 1
        src.close()
