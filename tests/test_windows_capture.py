"""Windows capture arms (waveIn mic + RegisterHotKey hotkeys) driven
through REAL ctypes against a compiled C fake of winmm/user32 — the
same pattern as the output-side Windows round (f3cf521's COM vtables)
and tests/test_macos_shell.py. The fake's GetMessageW is a real
blocking queue fed from PostThreadMessageW and fake_post_hotkey, so
the backend's cross-thread registration protocol runs for real."""

import ctypes
import shutil
import subprocess
import sys
import time

import numpy as np
import pytest

FAKE_C = r"""
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <pthread.h>

/* ---------------- winmm (waveIn) fake ---------------- */

typedef struct {
    void *lpData;
    uint32_t dwBufferLength;
    uint32_t dwBytesRecorded;
    void *dwUser;
    uint32_t dwFlags;
    uint32_t dwLoops;
    void *lpNext;
    void *reserved;
} WAVEHDR;

typedef struct {
    uint16_t wFormatTag;
    uint16_t nChannels;
    uint32_t nSamplesPerSec;
    uint32_t nAvgBytesPerSec;
    uint16_t nBlockAlign;
    uint16_t wBitsPerSample;
    uint16_t cbSize;
} WAVEFORMATEX;

typedef void (*wavein_cb)(void *, uint32_t, void *, WAVEHDR *, void *);
static wavein_cb wi_callback = 0;
static WAVEHDR *wi_hdrs[8];
static int wi_n_hdrs = 0;
static int wi_added = 0;
static int wi_started = 0;
static uint32_t wi_rate = 0, wi_channels = 0, wi_bits = 0, wi_tag = 0;

uint32_t waveInOpen(void **out, uint32_t dev, WAVEFORMATEX *fmt,
                    wavein_cb cb, void *inst, uint32_t flags) {
    (void)dev; (void)inst; (void)flags;
    wi_n_hdrs = 0;  /* new stream: drop dangling prior-source headers */
    wi_added = 0;
    wi_rate = fmt->nSamplesPerSec;
    wi_channels = fmt->nChannels;
    wi_bits = fmt->wBitsPerSample;
    wi_tag = fmt->wFormatTag;
    wi_callback = cb;
    *out = (void *)0xBB;
    return 0;
}

uint32_t waveInPrepareHeader(void *h, WAVEHDR *hdr, uint32_t sz) {
    (void)h; (void)sz;
    wi_hdrs[wi_n_hdrs++] = hdr;
    return 0;
}

uint32_t waveInAddBuffer(void *h, WAVEHDR *hdr, uint32_t sz) {
    (void)h; (void)hdr; (void)sz;
    wi_added++;
    return 0;
}

uint32_t waveInStart(void *h) { (void)h; wi_started = 1; return 0; }
uint32_t waveInStop(void *h) { (void)h; wi_started = 0; return 0; }
uint32_t waveInReset(void *h) { (void)h; return 0; }
uint32_t waveInClose(void *h) { (void)h; return 0; }

uint32_t fake_wi_rate(void) { return wi_rate; }
uint32_t fake_wi_channels(void) { return wi_channels; }
uint32_t fake_wi_bits(void) { return wi_bits; }
uint32_t fake_wi_tag(void) { return wi_tag; }
int fake_wi_added(void) { return wi_added; }
int fake_wi_started(void) { return wi_started; }

void fake_wi_feed(const int16_t *samples, int n) {
    if (!wi_callback || wi_n_hdrs == 0) return;
    WAVEHDR *h = wi_hdrs[0];
    uint32_t nbytes = (uint32_t)(n * 2);
    if (nbytes > h->dwBufferLength) nbytes = h->dwBufferLength;
    memcpy(h->lpData, samples, nbytes);
    h->dwBytesRecorded = nbytes;
    wi_callback(0, 0x3C0 /*WIM_DATA*/, 0, h, 0);
}

/* ---------------- user32 message-loop fake ---------------- */

typedef struct {
    void *hwnd;
    uint32_t message;
    size_t wParam;
    ssize_t lParam;
    uint32_t time;
    long pt_x, pt_y;
} MSG;

#define QCAP 256
static MSG mq[QCAP];
static int mq_head = 0, mq_tail = 0;
static pthread_mutex_t mq_mu = PTHREAD_MUTEX_INITIALIZER;
static pthread_cond_t mq_cv = PTHREAD_COND_INITIALIZER;

static struct { int id; uint32_t mods; uint32_t vk; int live; } hk[64];
static int n_hk = 0;
static int16_t key_state[512];

static void post(uint32_t message, size_t w, ssize_t l) {
    pthread_mutex_lock(&mq_mu);
    mq[mq_tail % QCAP].hwnd = 0;
    mq[mq_tail % QCAP].message = message;
    mq[mq_tail % QCAP].wParam = w;
    mq[mq_tail % QCAP].lParam = l;
    mq_tail++;
    pthread_cond_signal(&mq_cv);
    pthread_mutex_unlock(&mq_mu);
}

int GetMessageW(MSG *out, void *hwnd, uint32_t lo, uint32_t hi) {
    (void)hwnd; (void)lo; (void)hi;
    pthread_mutex_lock(&mq_mu);
    while (mq_head == mq_tail) pthread_cond_wait(&mq_cv, &mq_mu);
    *out = mq[mq_head % QCAP];
    mq_head++;
    pthread_mutex_unlock(&mq_mu);
    return 1;
}

int PostThreadMessageW(uint32_t tid, uint32_t message, size_t w,
                       ssize_t l) {
    (void)tid;
    post(message, w, l);
    return 1;
}

int RegisterHotKey(void *hwnd, int id, uint32_t mods, uint32_t vk) {
    (void)hwnd;
    if (vk == 0xDEAD) return 0; /* scripted failure */
    hk[n_hk].id = id; hk[n_hk].mods = mods; hk[n_hk].vk = vk;
    hk[n_hk].live = 1;
    n_hk++;
    return 1;
}

int UnregisterHotKey(void *hwnd, int id) {
    (void)hwnd;
    for (int i = 0; i < n_hk; i++)
        if (hk[i].id == id && hk[i].live) { hk[i].live = 0; return 1; }
    return 0;
}

int16_t GetAsyncKeyState(int vk) { return key_state[vk & 511]; }
uint32_t GetCurrentThreadId(void) { return 42; }

/* ---------------- Shell_NotifyIcon tray fake ---------------- */

typedef ssize_t (*wndproc_t)(void *, uint32_t, size_t, ssize_t);
static wndproc_t wnd_proc = 0;

typedef struct {
    uint32_t style;
    wndproc_t lpfnWndProc;
    int cbClsExtra, cbWndExtra;
    void *hInstance, *hIcon, *hCursor, *hbrBackground;
    wchar_t *lpszMenuName, *lpszClassName;
} WNDCLASSW_;

uint16_t RegisterClassW(WNDCLASSW_ *wc) { wnd_proc = wc->lpfnWndProc; return 1; }

void *CreateWindowExW(uint32_t ex, wchar_t *cls, wchar_t *name,
                      uint32_t style, int x, int y, int w, int h,
                      ssize_t parent, void *menu, void *inst, void *p) {
    (void)ex; (void)cls; (void)name; (void)style; (void)x; (void)y;
    (void)w; (void)h; (void)parent; (void)menu; (void)inst; (void)p;
    return (void *)0x77;
}

typedef struct {
    uint32_t cbSize;
    void *hWnd;
    uint32_t uID, uFlags, uCallbackMessage;
    void *hIcon;
    wchar_t szTip[128];
} NID;

static int ni_ops[64];
static int ni_n = 0;
static uint32_t ni_cbmsg = 0;
static size_t last_icon_id = 0;
static wchar_t ni_tip[128];

int Shell_NotifyIconW(uint32_t op, NID *nid) {
    ni_ops[ni_n++ % 64] = (int)op;
    ni_cbmsg = nid->uCallbackMessage;
    memcpy(ni_tip, nid->szTip, sizeof(ni_tip));
    return 1;
}

void *LoadIconW(void *inst, size_t id) {
    (void)inst; last_icon_id = id; return (void *)id;
}

ssize_t DefWindowProcW(void *h, uint32_t m, size_t w, ssize_t l) {
    (void)h; (void)m; (void)w; (void)l; return 0;
}

ssize_t DispatchMessageW(MSG *m) {
    if (wnd_proc) return wnd_proc(m->hwnd, m->message, m->wParam, m->lParam);
    return 0;
}

static size_t menu_ids[32];
static int menu_n = 0;
static int track_ret = 0;
static int track_called = 0;

void *CreatePopupMenu(void) { menu_n = 0; return (void *)0x88; }
int AppendMenuW(void *m, uint32_t f, size_t id, wchar_t *label) {
    (void)m; (void)f; (void)label;
    menu_ids[menu_n++ % 32] = id;
    return 1;
}
int TrackPopupMenu(void *m, uint32_t flags, int x, int y, int r,
                   void *hwnd, void *rect) {
    (void)m; (void)flags; (void)x; (void)y; (void)r; (void)hwnd;
    (void)rect;
    track_called++;
    return track_ret;
}
int DestroyMenu(void *m) { (void)m; return 1; }
int DestroyWindow(void *h) { (void)h; return 1; }
int GetCursorPos(long *pt) { pt[0] = 10; pt[1] = 20; return 1; }

int fake_ni_count(void) { return ni_n; }
int fake_ni_op(int i) { return ni_ops[i]; }
uint32_t fake_ni_cbmsg(void) { return ni_cbmsg; }
size_t fake_last_icon_id(void) { return last_icon_id; }
int fake_menu_count(void) { return menu_n; }
int fake_track_called(void) { return track_called; }
void fake_set_track_ret(int v) { track_ret = v; }
void fake_ni_reset(void) { ni_n = 0; track_called = 0; }

static void post_hwnd(void *hwnd, uint32_t message, size_t w, ssize_t l) {
    pthread_mutex_lock(&mq_mu);
    mq[mq_tail % QCAP].hwnd = hwnd;
    mq[mq_tail % QCAP].message = message;
    mq[mq_tail % QCAP].wParam = w;
    mq[mq_tail % QCAP].lParam = l;
    mq_tail++;
    pthread_cond_signal(&mq_cv);
    pthread_mutex_unlock(&mq_mu);
}

/* Deliver a tray callback: queued (hwnd=0, direct arm) or through the
   window (hwnd set -> DispatchMessageW -> registered WNDPROC). */
void fake_tray_event(ssize_t event) { post_hwnd(0, 0x800A, 1, event); }
void fake_tray_event_hwnd(ssize_t event) {
    post_hwnd((void *)0x77, 0x800A, 1, event);
}

int fake_hk_count(void) {
    int c = 0;
    for (int i = 0; i < n_hk; i++) c += hk[i].live;
    return c;
}
uint32_t fake_hk_mods(int i) { return hk[i].mods; }
uint32_t fake_hk_vk(int i) { return hk[i].vk; }
void fake_set_key_state(int vk, int down) {
    key_state[vk & 511] = down ? (int16_t)0x8000 : 0;
}
void fake_press_hotkey(int id) { post(0x0312 /*WM_HOTKEY*/, id, 0); }
"""


@pytest.fixture(scope="module")
def fake_lib(tmp_path_factory):
    cc = shutil.which("cc") or shutil.which("gcc")
    if cc is None:
        pytest.skip("no C compiler in image")
    d = tmp_path_factory.mktemp("windows_capture")
    src = d / "fake_win.c"
    src.write_text(FAKE_C)
    ext = ".dylib" if sys.platform == "darwin" else ".so"
    out = d / ("libfake_win" + ext)
    subprocess.run(
        [cc, "-shared", "-fPIC", "-O1", "-o", str(out), str(src),
         "-lpthread"],
        check=True,
    )
    lib = ctypes.CDLL(str(out))
    lib.fake_wi_feed.argtypes = [
        ctypes.POINTER(ctypes.c_int16), ctypes.c_int,
    ]
    lib.GetAsyncKeyState.restype = ctypes.c_int16
    return lib


class TestWaveInMic:
    def test_format_and_lifecycle(self, fake_lib):
        from spittle_tpu.shell.windows_mic import WinMicSource

        src = WinMicSource(winmm=fake_lib)
        assert fake_lib.fake_wi_rate() == 16000
        assert fake_lib.fake_wi_channels() == 1
        assert fake_lib.fake_wi_bits() == 16
        assert fake_lib.fake_wi_tag() == 1  # WAVE_FORMAT_PCM
        assert fake_lib.fake_wi_started() == 1
        assert fake_lib.fake_wi_added() >= 3
        src.close()
        assert fake_lib.fake_wi_started() == 0

    def test_pcm_flows_from_driver_callback_to_read(self, fake_lib):
        from spittle_tpu.shell.windows_mic import WinMicSource

        src = WinMicSource(winmm=fake_lib)
        before = fake_lib.fake_wi_added()
        pcm = (np.sin(np.arange(256) / 10.0) * 16000).astype(np.int16)
        fake_lib.fake_wi_feed(
            pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), len(pcm)
        )
        got = src.read(timeout=1.0)
        assert got is not None and len(got) == 256
        np.testing.assert_allclose(
            got, pcm.astype(np.float32) / 32768.0, rtol=0, atol=1e-7
        )
        assert fake_lib.fake_wi_added() == before + 1  # re-enqueued
        src.close()


def _wait(pred, timeout=3.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if pred():
            return True
        time.sleep(0.01)
    return pred()


class TestRegisterHotKey:
    @pytest.fixture
    def backend(self, fake_lib):
        from spittle_tpu.shell.windows_keys import WinHotkeyBackend

        b = WinHotkeyBackend(user32=fake_lib, kernel32=fake_lib,
                             poll_interval=0.005)
        yield b
        b.close()

    def test_register_translates_chord(self, backend, fake_lib):
        from spittle_tpu.shell.windows_keys import (
            MOD_CONTROL, MOD_NOREPEAT, MOD_SHIFT,
        )

        before = fake_lib.fake_hk_count()
        assert backend.register("ctrl+shift+space", lambda hk, p: None)
        assert _wait(lambda: fake_lib.fake_hk_count() == before + 1)
        i = fake_lib.fake_hk_count() - 1
        assert fake_lib.fake_hk_mods(i) == (
            MOD_CONTROL | MOD_SHIFT | MOD_NOREPEAT
        )
        assert fake_lib.fake_hk_vk(i) == 0x20  # VK_SPACE

    def test_press_and_release_edges(self, backend, fake_lib):
        fired = []
        fake_lib.fake_set_key_state(0x20, 1)  # space held
        assert backend.register("ctrl+space",
                                lambda hk, p: fired.append((hk, p)))
        _wait(lambda: fake_lib.fake_hk_count() >= 1)
        hid = backend._ids["ctrl+space"]
        fake_lib.fake_press_hotkey(hid)
        assert _wait(lambda: ("ctrl+space", True) in fired)
        assert ("ctrl+space", False) not in fired  # still held
        fake_lib.fake_set_key_state(0x20, 0)      # released
        assert _wait(lambda: ("ctrl+space", False) in fired)

    def test_unregister(self, backend, fake_lib):
        before = fake_lib.fake_hk_count()
        assert backend.register("alt+f4", lambda hk, p: None)
        assert _wait(lambda: fake_lib.fake_hk_count() == before + 1)
        assert backend.unregister("alt+f4")
        assert _wait(lambda: fake_lib.fake_hk_count() == before)
        assert not backend.unregister("alt+f4")  # already gone

    def test_failed_registration_rolls_back(self, backend, fake_lib):
        """The fake rejects vk 0xDEAD — not mappable from a name, so
        register() must reject unknown keys before even posting."""
        assert not backend.register("ctrl+nosuchkey", lambda hk, p: None)
        assert "ctrl+nosuchkey" not in backend._ids


class TestWinTray:
    WM_LBUTTONUP = 0x0202
    WM_RBUTTONUP = 0x0205

    def _tray(self, fake_lib, activated=None, clicked=None):
        from spittle_tpu.shell.windows_tray import WinTray

        fake_lib.fake_ni_reset()
        return WinTray(
            [("settings", "Settings"), ("cancel", "Cancel"),
             ("quit", "Quit")],
            on_activate=(lambda: activated.append(1))
            if activated is not None else None,
            on_menu=clicked.append if clicked is not None else None,
            user32=fake_lib, shell32=fake_lib, kernel32=fake_lib,
        )

    def test_icon_added_and_removed(self, fake_lib):
        from spittle_tpu.shell.windows_tray import WM_APP_TRAY

        tray = self._tray(fake_lib)
        assert _wait(lambda: fake_lib.fake_ni_count() >= 1)
        assert fake_lib.fake_ni_op(0) == 0  # NIM_ADD
        assert fake_lib.fake_ni_cbmsg() == WM_APP_TRAY
        tray.close()
        ops = [fake_lib.fake_ni_op(i)
               for i in range(fake_lib.fake_ni_count())]
        assert 2 in ops  # NIM_DELETE on close

    def test_left_click_activates(self, fake_lib):
        activated = []
        tray = self._tray(fake_lib, activated=activated)
        _wait(lambda: fake_lib.fake_ni_count() >= 1)
        fake_lib.fake_tray_event(self.WM_LBUTTONUP)
        assert _wait(lambda: activated == [1])
        tray.close()

    def test_right_click_menu_dispatches_through_wndproc(self, fake_lib):
        """The callback routed through the WINDOW (DispatchMessageW ->
        registered WNDPROC thunk) opens the popup menu; the scripted
        TrackPopupMenu selection maps back to the item id."""
        clicked = []
        tray = self._tray(fake_lib, clicked=clicked)
        _wait(lambda: fake_lib.fake_ni_count() >= 1)
        fake_lib.fake_set_track_ret(2)  # second item -> "cancel"
        fake_lib.fake_tray_event_hwnd(self.WM_RBUTTONUP)
        assert _wait(lambda: clicked == ["cancel"])
        assert fake_lib.fake_track_called() >= 1
        assert fake_lib.fake_menu_count() == 3
        fake_lib.fake_set_track_ret(0)  # dismissed: no dispatch
        fake_lib.fake_tray_event_hwnd(self.WM_RBUTTONUP)
        assert _wait(lambda: fake_lib.fake_track_called() >= 2)
        assert clicked == ["cancel"]
        tray.close()

    def test_set_state_modifies_icon(self, fake_lib):
        from spittle_tpu.app.ui_state import TrayIconState
        from spittle_tpu.shell.windows_tray import IDI_EXCLAMATION

        tray = self._tray(fake_lib)
        _wait(lambda: fake_lib.fake_ni_count() >= 1)
        tray.set_state(TrayIconState.RECORDING)
        assert _wait(lambda: fake_lib.fake_ni_count() >= 2)
        ops = [fake_lib.fake_ni_op(i)
               for i in range(fake_lib.fake_ni_count())]
        assert 1 in ops  # NIM_MODIFY
        assert fake_lib.fake_last_icon_id() == IDI_EXCLAMATION
        tray.close()
