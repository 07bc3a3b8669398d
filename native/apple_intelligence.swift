// Apple Intelligence shim: FoundationModels behind a 3-symbol C ABI.
//
// Counterpart of the reference's Swift shim (consumed through
// src-tauri/src/apple_intelligence.rs:13-20); rebuilt from the ABI
// contract documented in spittle_tpu/shell/apple_llm.py, which loads
// the dylib this file produces (native/build_apple_llm.sh).
//
// Memory contract: every char* handed across the boundary is strdup'd
// here and released only by free_apple_llm_response. The Python side
// never frees individual fields.
//
// Build (Apple Silicon, macOS 26+ SDK):
//   swiftc -O -emit-library -o libspittle_apple_llm.dylib \
//       apple_intelligence.swift

import Dispatch
import Foundation
#if canImport(FoundationModels)
import FoundationModels
#endif

// Field order must match spittle_tpu/shell/apple_llm.py:AppleLLMResponse.
public struct AppleLLMResponse {
    public var response: UnsafeMutablePointer<CChar>?
    public var success: Int32
    public var error_message: UnsafeMutablePointer<CChar>?
}

private func owned(_ s: String) -> UnsafeMutablePointer<CChar>? {
    s.withCString { strdup($0) }
}

private func makeResponse(
    text: String? = nil, error: String? = nil
) -> UnsafeMutablePointer<AppleLLMResponse> {
    let out = UnsafeMutablePointer<AppleLLMResponse>.allocate(capacity: 1)
    if let text = text {
        out.initialize(to: AppleLLMResponse(
            response: owned(text), success: 1, error_message: nil))
    } else {
        out.initialize(to: AppleLLMResponse(
            response: nil, success: 0,
            error_message: owned(error ?? "Unknown error")))
    }
    return out
}

/// Keep at most `limit` whitespace-separated words (limit <= 0: keep all).
private func clampWords(_ text: String, _ limit: Int32) -> String {
    guard limit > 0 else { return text }
    let words = text.split(whereSeparator: { $0.isWhitespace })
    guard words.count > Int(limit) else { return text }
    return words.prefix(Int(limit)).joined(separator: " ")
}

@_cdecl("is_apple_intelligence_available")
public func is_apple_intelligence_available() -> Int32 {
    #if canImport(FoundationModels)
    if #available(macOS 26.0, *) {
        if case .available = SystemLanguageModel.default.availability {
            return 1
        }
    }
    #endif
    return 0
}

@_cdecl("process_text_with_apple_llm")
public func process_text_with_apple_llm(
    _ prompt: UnsafePointer<CChar>, _ maxTokens: Int32
) -> UnsafeMutablePointer<AppleLLMResponse> {
    #if canImport(FoundationModels)
    guard #available(macOS 26.0, *) else {
        return makeResponse(error: "Apple Intelligence requires macOS 26 or newer.")
    }
    let model = SystemLanguageModel.default
    guard case .available = model.availability else {
        return makeResponse(error: "Apple Intelligence is not currently available on this device.")
    }

    let request = String(cString: prompt)
    let done = DispatchSemaphore(value: 0)
    // The C caller blocks this thread; the model call is async. Results
    // cross back through a lock-free single-writer box.
    final class Box: @unchecked Sendable {
        var text: String?
        var failure: String?
    }
    let box = Box()
    Task.detached(priority: .userInitiated) {
        defer { done.signal() }
        do {
            let session = LanguageModelSession(model: model)
            let reply = try await session.respond(to: request)
            box.text = clampWords(reply.content, maxTokens)
        } catch {
            box.failure = error.localizedDescription
        }
    }
    done.wait()

    if let text = box.text {
        return makeResponse(text: text)
    }
    return makeResponse(error: box.failure ?? "Unknown error")
    #else
    return makeResponse(error: "FoundationModels is unavailable in this SDK.")
    #endif
}

@_cdecl("free_apple_llm_response")
public func free_apple_llm_response(
    _ ptr: UnsafeMutablePointer<AppleLLMResponse>?
) {
    guard let ptr = ptr else { return }
    if let p = ptr.pointee.response { free(p) }
    if let p = ptr.pointee.error_message { free(p) }
    ptr.deinitialize(count: 1)
    ptr.deallocate()
}
