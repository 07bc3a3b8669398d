// Native keystroke injection via Linux uinput.
//
// The reference simulates input with enigo (src-tauri/src/input.rs:
// layout-independent paste keycodes, batched arrow-key movement); on
// Linux enigo ultimately writes evdev events. This is that path without
// the crate: a virtual keyboard device created through /dev/uinput,
// emitting EV_KEY events the compositor treats exactly like hardware —
// works on X11 AND Wayland with no external tool (the wtype/ydotool
// chain in shell/textout.py stays as the no-permission fallback).
//
// C ABI only; consumed by spittle_tpu/shell/uinput.py over ctypes.
// Keycode mapping assumes a US keymap, the same assumption ydotool makes.

#include <cstdint>
#include <cstring>

#if defined(__linux__)
#include <fcntl.h>
#include <linux/uinput.h>
#include <unistd.h>

namespace {

struct KeyStroke {
    uint16_t code;
    bool shift;
};

// ASCII -> (keycode, shifted) for a US keymap.
bool ascii_to_key(unsigned char c, KeyStroke* out) {
    static const uint16_t digits[10] = {KEY_0, KEY_1, KEY_2, KEY_3, KEY_4,
                                        KEY_5, KEY_6, KEY_7, KEY_8, KEY_9};
    static const uint16_t letters[26] = {
        KEY_A, KEY_B, KEY_C, KEY_D, KEY_E, KEY_F, KEY_G, KEY_H, KEY_I,
        KEY_J, KEY_K, KEY_L, KEY_M, KEY_N, KEY_O, KEY_P, KEY_Q, KEY_R,
        KEY_S, KEY_T, KEY_U, KEY_V, KEY_W, KEY_X, KEY_Y, KEY_Z};
    if (c >= 'a' && c <= 'z') { *out = {letters[c - 'a'], false}; return true; }
    if (c >= 'A' && c <= 'Z') { *out = {letters[c - 'A'], true}; return true; }
    if (c >= '0' && c <= '9') { *out = {digits[c - '0'], false}; return true; }
    switch (c) {
        case ' ': *out = {KEY_SPACE, false}; return true;
        case '\n': *out = {KEY_ENTER, false}; return true;
        case '\t': *out = {KEY_TAB, false}; return true;
        case '-': *out = {KEY_MINUS, false}; return true;
        case '_': *out = {KEY_MINUS, true}; return true;
        case '=': *out = {KEY_EQUAL, false}; return true;
        case '+': *out = {KEY_EQUAL, true}; return true;
        case '[': *out = {KEY_LEFTBRACE, false}; return true;
        case '{': *out = {KEY_LEFTBRACE, true}; return true;
        case ']': *out = {KEY_RIGHTBRACE, false}; return true;
        case '}': *out = {KEY_RIGHTBRACE, true}; return true;
        case '\\': *out = {KEY_BACKSLASH, false}; return true;
        case '|': *out = {KEY_BACKSLASH, true}; return true;
        case ';': *out = {KEY_SEMICOLON, false}; return true;
        case ':': *out = {KEY_SEMICOLON, true}; return true;
        case '\'': *out = {KEY_APOSTROPHE, false}; return true;
        case '"': *out = {KEY_APOSTROPHE, true}; return true;
        case '`': *out = {KEY_GRAVE, false}; return true;
        case '~': *out = {KEY_GRAVE, true}; return true;
        case ',': *out = {KEY_COMMA, false}; return true;
        case '<': *out = {KEY_COMMA, true}; return true;
        case '.': *out = {KEY_DOT, false}; return true;
        case '>': *out = {KEY_DOT, true}; return true;
        case '/': *out = {KEY_SLASH, false}; return true;
        case '?': *out = {KEY_SLASH, true}; return true;
        case '1': case '!': *out = {KEY_1, c == '!'}; return true;
        case '@': *out = {KEY_2, true}; return true;
        case '#': *out = {KEY_3, true}; return true;
        case '$': *out = {KEY_4, true}; return true;
        case '%': *out = {KEY_5, true}; return true;
        case '^': *out = {KEY_6, true}; return true;
        case '&': *out = {KEY_7, true}; return true;
        case '*': *out = {KEY_8, true}; return true;
        case '(': *out = {KEY_9, true}; return true;
        case ')': *out = {KEY_0, true}; return true;
        default: return false;
    }
}

int emit(int fd, uint16_t type, uint16_t code, int32_t value) {
    struct input_event ev;
    std::memset(&ev, 0, sizeof(ev));
    ev.type = type;
    ev.code = code;
    ev.value = value;
    return write(fd, &ev, sizeof(ev)) == sizeof(ev) ? 0 : -1;
}

int syn(int fd) { return emit(fd, EV_SYN, SYN_REPORT, 0); }

int tap(int fd, uint16_t code, bool shift, unsigned delay_us) {
    if (shift && emit(fd, EV_KEY, KEY_LEFTSHIFT, 1)) return -1;
    if (emit(fd, EV_KEY, code, 1)) return -1;
    if (syn(fd)) return -1;
    if (emit(fd, EV_KEY, code, 0)) return -1;
    if (shift && emit(fd, EV_KEY, KEY_LEFTSHIFT, 0)) return -1;
    if (syn(fd)) return -1;
    if (delay_us) usleep(delay_us);
    return 0;
}

uint16_t named_key(const char* name) {
    struct Entry { const char* n; uint16_t c; };
    static const Entry table[] = {
        {"enter", KEY_ENTER},     {"return", KEY_ENTER},
        {"escape", KEY_ESC},      {"backspace", KEY_BACKSPACE},
        {"tab", KEY_TAB},         {"space", KEY_SPACE},
        {"left", KEY_LEFT},       {"right", KEY_RIGHT},
        {"up", KEY_UP},           {"down", KEY_DOWN},
        {"home", KEY_HOME},       {"end", KEY_END},
        {"delete", KEY_DELETE},   {"insert", KEY_INSERT},
        {"v", KEY_V},             {"a", KEY_A},
        {"c", KEY_C},             {"x", KEY_X},
        {"z", KEY_Z},
    };
    for (const auto& e : table)
        if (!std::strcmp(name, e.n)) return e.c;
    return 0;
}

}  // namespace

extern "C" {

// Creates the virtual keyboard; returns fd >= 0 or -1. The caller should
// sleep ~100 ms after creation: compositors enumerate new devices
// asynchronously and drop events sent before the device registers.
int spittle_uinput_open(void) {
    int fd = open("/dev/uinput", O_WRONLY | O_NONBLOCK);
    if (fd < 0) return -1;
    if (ioctl(fd, UI_SET_EVBIT, EV_KEY) < 0) { close(fd); return -1; }
    for (int code = KEY_ESC; code <= KEY_MICMUTE; ++code)
        ioctl(fd, UI_SET_KEYBIT, code);

    struct uinput_setup setup;
    std::memset(&setup, 0, sizeof(setup));
    setup.id.bustype = BUS_VIRTUAL;
    setup.id.vendor = 0x5350;   // "SP"
    setup.id.product = 0x5450;  // "TP"
    std::strncpy(setup.name, "spittle-tpu virtual keyboard",
                 sizeof(setup.name) - 1);
    if (ioctl(fd, UI_DEV_SETUP, &setup) < 0 ||
        ioctl(fd, UI_DEV_CREATE) < 0) {
        close(fd);
        return -1;
    }
    return fd;
}

// Types ASCII text (US keymap). Returns the index of the first character
// it could not map (== strlen on full success), or -1 on write error.
int spittle_uinput_type(int fd, const char* text, unsigned delay_us) {
    for (int i = 0; text[i]; ++i) {
        KeyStroke ks;
        if (!ascii_to_key(static_cast<unsigned char>(text[i]), &ks))
            return i;
        if (tap(fd, ks.code, ks.shift, delay_us)) return -1;
    }
    return static_cast<int>(std::strlen(text));
}

// Presses a named key `count` times with modifier bits
// (1=ctrl, 2=shift, 4=alt, 8=meta). Returns 0, or -1 on error/unknown.
int spittle_uinput_key(int fd, const char* name, int mods, int count,
                       unsigned delay_us) {
    uint16_t code = named_key(name);
    if (!code) return -1;
    int err = 0;
    if ((mods & 1) && emit(fd, EV_KEY, KEY_LEFTCTRL, 1)) err = -1;
    if (!err && (mods & 2) && emit(fd, EV_KEY, KEY_LEFTSHIFT, 1)) err = -1;
    if (!err && (mods & 4) && emit(fd, EV_KEY, KEY_LEFTALT, 1)) err = -1;
    if (!err && (mods & 8) && emit(fd, EV_KEY, KEY_LEFTMETA, 1)) err = -1;
    if (!err && mods && syn(fd)) err = -1;
    if (!err)
        for (int i = 0; i < count; ++i)
            if (tap(fd, code, false, delay_us)) { err = -1; break; }
    // ALWAYS best-effort release the modifiers, including after an
    // error: a stuck virtual ctrl/shift turns every subsequent
    // keystroke from any device into a shortcut until the virtual
    // keyboard is destroyed.
    if ((mods & 1) && emit(fd, EV_KEY, KEY_LEFTCTRL, 0)) err = -1;
    if ((mods & 2) && emit(fd, EV_KEY, KEY_LEFTSHIFT, 0)) err = -1;
    if ((mods & 4) && emit(fd, EV_KEY, KEY_LEFTALT, 0)) err = -1;
    if ((mods & 8) && emit(fd, EV_KEY, KEY_LEFTMETA, 0)) err = -1;
    if (mods && syn(fd)) err = -1;
    return err;
}

void spittle_uinput_close(int fd) {
    if (fd >= 0) {
        ioctl(fd, UI_DEV_DESTROY);
        close(fd);
    }
}

}  // extern "C"

#else  // non-Linux: stubs so the .so still builds/loads

extern "C" {
int spittle_uinput_open(void) { return -1; }
int spittle_uinput_type(int, const char*, unsigned) { return -1; }
int spittle_uinput_key(int, const char*, int, int, unsigned) { return -1; }
void spittle_uinput_close(int) {}
}

#endif
